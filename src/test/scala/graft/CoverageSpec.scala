package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md is the single source of truth mapping SURVEY.md §2 (and
  * the LLM-extension surface) to registered queries — a query that
  * exists only in code silently falls out of the coverage story (six
  * did by round 10). This gate diffs the registry against the doc so
  * the two cannot drift again. */
class CoverageSpec extends AnyFunSuite {

  test("every registered query name appears in COVERAGE.md") {
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val missing = Queries.all.map(_.name).filterNot(doc.contains)
    assert(missing.isEmpty,
      s"queries registered but absent from COVERAGE.md: ${missing.mkString(", ")}")
  }

  test("query names are unique and oracle keys match registered queries") {
    val names = Queries.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    // the driver consumes SparkEntry's Map adapters, not Queries.all —
    // verify the adapter layer preserves the registry (oracle keys are
    // structurally a subset via QueryDef, but the adapter could still
    // drop entries through a name collision in toMap)
    val qKeys = SparkEntry.queries.keySet
    assert(qKeys == names.toSet,
      s"SparkEntry.queries drifted from the registry: " +
        s"missing ${(names.toSet -- qKeys).mkString(", ")}")
    val orphanOracles = SparkEntry.oracleSql.keySet -- qKeys
    assert(orphanOracles.isEmpty,
      s"oracle keys with no registered query: ${orphanOracles.mkString(", ")}")
  }
}
