package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class YamlSpec extends AnyFunSuite {

  private def M(kv: (String, Any)*) = scala.collection.immutable.VectorMap(kv: _*)

  test("scalars: types, quotes, comments") {
    val doc =
      """# full-line comment
        |version: 1
        |name: Example Migration
        |ratio: 2.5
        |skip: false
        |empty: null
        |tilde: ~
        |quoted: 'output/ledgers'  # trailing comment
        |dquoted: "a \"b\" c"
        |hash_in_quotes: 'a # not a comment'
        |url: http://example.com/x
        |""".stripMargin
    val m = Yaml.parse(doc).asInstanceOf[Map[String, Any]]
    assert(m("version") == 1L)
    assert(m("name") == "Example Migration")
    assert(m("ratio") == 2.5)
    assert(m("skip") == false)
    assert(m("empty") == null && m("tilde") == null)
    assert(m("quoted") == "output/ledgers")
    assert(m("dquoted") == "a \"b\" c")
    assert(m("hash_in_quotes") == "a # not a comment")
    assert(m("url") == "http://example.com/x")
  }

  test("double-quote escapes: literal backslash-n survives; escaped quote before #") {
    val doc =
      """regex: "a\\nb"
        |real_newline: "a\nb"
        |tricky: "say \" # quote\" end"
        |""".stripMargin
    val m = Yaml.parse(doc).asInstanceOf[Map[String, Any]]
    // \\n is backslash + n (e.g. a regex), NOT a newline
    assert(m("regex") == "a\\nb")
    assert(m("real_newline") == "a\nb")
    // the escaped quote must not close the string and expose ` # ` as a comment
    assert(m("tricky") == "say \" # quote\" end")
  }

  test("nesting: maps, lists, inline-map list items, flow lists") {
    val doc =
      """ledger:
        |  path: 'output/ledgers'
        |sources:
        |  localfs:
        |    type: filesystem
        |    path: ./imports
        |extract:
        |  - name: a
        |    prefix: 'legacy.'
        |    args:
        |      query:
        |        post_type: post
        |      withTaxonomies:
        |        - category
        |        - tag
        |flags: [JSON_PRETTY_PRINT, JSON_INVALID_UTF8_SUBSTITUTE]
        |plain:
        |  - one
        |  - two
        |""".stripMargin
    val m = Yaml.parse(doc).asInstanceOf[Map[String, Any]]
    assert(m("ledger") == M("path" -> "output/ledgers"))
    assert(m("sources") == M("localfs" -> M("type" -> "filesystem", "path" -> "./imports")))
    val ex = m("extract").asInstanceOf[Vector[Any]]
    assert(ex.size == 1)
    val item = ex.head.asInstanceOf[Map[String, Any]]
    assert(item("name") == "a" && item("prefix") == "legacy.")
    val args = item("args").asInstanceOf[Map[String, Any]]
    assert(args("query") == M("post_type" -> "post"))
    assert(args("withTaxonomies") == Vector("category", "tag"))
    assert(m("flags") == Vector("JSON_PRETTY_PRINT", "JSON_INVALID_UTF8_SUBSTITUTE"))
    assert(m("plain") == Vector("one", "two"))
  }

  test("map key order is preserved") {
    val m = Yaml.parse("z: 1\na: 2\nm: 3\n").asInstanceOf[Map[String, Any]]
    assert(m.keys.toSeq == Seq("z", "a", "m"))
  }

  test("!include splices the included document; relative to including file") {
    val dir = Files.createTempDirectory("graft_yaml").toFile
    val sub = new java.io.File(dir, "config"); sub.mkdirs()
    Files.write(new java.io.File(sub, "inner.yaml").toPath,
      "name: inner_job\nskip: true\n".getBytes("UTF-8"))
    Files.write(new java.io.File(dir, "main.yaml").toPath,
      """name: outer
        |migration:
        |  - !include "config/inner.yaml"
        |""".stripMargin.getBytes("UTF-8"))
    val m = Yaml.parseFile(new java.io.File(dir, "main.yaml").getPath)
      .asInstanceOf[Map[String, Any]]
    assert(m("migration") == Vector(M("name" -> "inner_job", "skip" -> true)))
  }

  test("circular !include fails fast") {
    val dir = Files.createTempDirectory("graft_yaml_cyc").toFile
    Files.write(new java.io.File(dir, "a.yaml").toPath,
      "x: !include \"b.yaml\"\n".getBytes("UTF-8"))
    Files.write(new java.io.File(dir, "b.yaml").toPath,
      "y: !include \"a.yaml\"\n".getBytes("UTF-8"))
    val e = intercept[Yaml.YamlException](
      Yaml.parseFile(new java.io.File(dir, "a.yaml").getPath))
    assert(e.getMessage.contains("circular"))
  }

  test("missing include target and malformed lines raise") {
    val dir = Files.createTempDirectory("graft_yaml_bad").toFile
    Files.write(new java.io.File(dir, "a.yaml").toPath,
      "x: !include \"nope.yaml\"\n".getBytes("UTF-8"))
    assert(intercept[Yaml.YamlException](
      Yaml.parseFile(new java.io.File(dir, "a.yaml").getPath))
      .getMessage.contains("not found"))
    assert(intercept[Yaml.YamlException](
      Yaml.parse("key_without_colon\n")).getMessage.contains("expected 'key: value'"))
  }

  test("flow list: commas inside quoted scalars are content, not separators") {
    val m = Yaml.parse(
      """tags: ['hello, world', "a, b", plain, 'it''s, ok']
        |nums: [1, 2]
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(m("tags") == Vector("hello, world", "a, b", "plain", "it's, ok"))
    assert(m("nums") == Vector(1L, 2L))
    assert(intercept[Yaml.YamlException](
      Yaml.parse("bad: ['unclosed, x]\n")).getMessage.contains("unclosed quote"))
  }

  test("flow list: plain scalars may contain quotes after the first char") {
    // a quote only OPENS a quoted scalar at element start — mid-token
    // apostrophes are literal content in plain scalars (valid YAML)
    val m = Yaml.parse(
      """tags: [it's fine, rock'n'roll, say "hi", x]
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(m("tags") == Vector("it's fine", "rock'n'roll", "say \"hi\"", "x"))
  }

  test("flow map: parses as a map, nests, preserves types and key order") {
    // the reference's Symfony-YAML configs use flow mappings
    // (`options: {budget: 512}`); before round 11 this silently became
    // the STRING "{budget: 512}"
    val m = Yaml.parse(
      """opts: {budget: 512, rate: 0.5, name: 'a, b', on: true}
        |empty: {}
        |nested: {inner: {k: v}, list: [1, {x: 2}]}
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(m("opts") == M("budget" -> 512L, "rate" -> 0.5,
      "name" -> "a, b", "on" -> true))
    assert(m("opts").asInstanceOf[Map[String, Any]].keys.toSeq ==
      Seq("budget", "rate", "name", "on"))
    assert(m("empty") == M())
    assert(m("nested") == M("inner" -> M("k" -> "v"),
      "list" -> Vector(1L, M("x" -> 2L))))
  }

  test("flow map: malformed input fails loudly instead of degrading to a string") {
    // half-open flow collection
    assert(intercept[Yaml.YamlException](
      Yaml.parse("bad: {budget: 512\n")).getMessage
      .contains("unterminated flow collection"))
    assert(intercept[Yaml.YamlException](
      Yaml.parse("bad: [1, 2\n")).getMessage
      .contains("unterminated flow collection"))
    // entry that is not `key: value`
    assert(intercept[Yaml.YamlException](
      Yaml.parse("bad: {budget=512}\n")).getMessage
      .contains("is not 'key: value'"))
    // unbalanced nesting inside a closed-looking collection
    assert(intercept[Yaml.YamlException](
      Yaml.parse("bad: [{a: 1]\n")).getMessage
      .contains("unbalanced"))
  }

  test("flow map flows through ConfigLoader as step options") {
    val jobs = ConfigLoader.parse(
      // JSON is YAML flow style — but exercise the YAML path explicitly
      // via parseYamlFile on a temp file
      """{"jobs":[{"name":"j","extract":[],"transform":[],"load":[]}]}""")
    assert(jobs.head.name == "j")
    val f = Files.createTempFile("graft_flowmap", ".yaml")
    Files.writeString(f,
      """jobs:
        |  - name: flow
        |    extract:
        |      - {kind: parquet, path: /tmp/unused.parquet}
        |    transform:
        |      - kind: limit
        |        options: {n: 2}
        |""".stripMargin)
    val spec = ConfigLoader.parseYamlFile(f.toString)
    assert(spec.head.name == "flow")
    assert(spec.head.transform.size == 1) // limit resolved with n=2
  }
}
