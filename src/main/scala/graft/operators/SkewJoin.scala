package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join: the manual skew-mitigation recipe for when one join
 * key carries a disproportionate share of rows and AQE's skew-join split
 * can't apply (e.g. the skewed side feeds a required distribution, or
 * the optimizer under-detects the skew).
 *
 * The LARGE (skewed) side gets a deterministic per-row salt in
 * [0, salt); the other side replicates each row `salt` ways. The join
 * key becomes (key, salt), so a hot key's rows spread over `salt`
 * reducer partitions instead of one straggler task — at the cost of
 * replicating the smaller side `salt`×. Result set is IDENTICAL to the
 * unsalted inner join (every (l, r) match pairs exactly once: r carries
 * all salt values, l exactly one).
 *
 * The salt must not depend on the join key alone (all rows of the hot
 * key would land in one bucket again): it hashes the WHOLE row, so any
 * column diversity spreads the hot key.
 */
object SkewJoin {

  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol: Column = pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int")
    val l = large.withColumn("__graft_salt", saltCol)
    val r = small.withColumn("__graft_salt",
      explode(typedlit((0 until salt).toIndexedSeq)))
    l.join(r, l(largeKey) === r(smallKey) && l("__graft_salt") === r("__graft_salt"))
      .drop("__graft_salt")
  }
}
