package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for heavy-hitter join keys.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; the
  * explicit salted join below is for the pathological case AQE can't
  * fix — a single key too hot for any partition split where the other
  * side must be replicated: the big side spreads each key over
  * `salts` sub-partitions (deterministic hash of the whole row, no
  * rand() — keeps reruns/retries stable), the small side replicates
  * once per salt, and the join key becomes (key, salt).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted. Result equals the
    * plain inner join, but the shuffle spreads each big-side key over
    * `salts` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    // deterministic per-row salt: hash of ALL big-side columns — stable
    // across task retries (rand() would not be)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallReplicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
