package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants for the ANALYZE-style stats and the dataset digest. */
class TableStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column stats: nulls counted, NDV exact, min/max over non-nulls") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (3L, "a"), (3L, "a"), (null, "c"))
      .toDF("k", "s")
    val out = TableStats.columnStats(df, Seq("k", "s")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val k = out("k")
    assert(k.getAs[Long]("n_rows") == 5 && k.getAs[Long]("n_nonnull") == 4 &&
      k.getAs[Long]("n_null") == 1 && k.getAs[Long]("n_distinct") == 3)
    assert(k.getAs[String]("min_val") == "1" && k.getAs[String]("max_val") == "3")
    val s = out("s")
    assert(s.getAs[Long]("n_null") == 1 && s.getAs[Long]("n_distinct") == 3)
    assert(s.getAs[String]("min_val") == "a" && s.getAs[String]("max_val") == "c")
  }

  test("dataset digest: order/partitioning-insensitive; shards combine by (add, add, xor)") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "t")
    val b = Seq((4L, "w"), (5L, "y")).toDF("id", "t")
    def dig(df: org.apache.spark.sql.DataFrame) = {
      val r = TableStats.datasetDigest(df, Seq("id", "t")).collect().head
      (r.getAs[Long]("n_rows"), BigInt(r.getAs[String]("digest_sum")),
        r.getAs[Long]("digest_xor"))
    }
    val (na, sa, xa) = dig(a)
    val (nb, sb, xb) = dig(b)
    val (nu, su, xu) = dig(a.unionByName(b))
    assert((na + nb, sa + sb, xa ^ xb) == ((nu, su, xu)),
      "shard digests must combine element-wise")
    // permuted + repartitioned input digests identically
    val (np, sp, xp) = dig(a.unionByName(b).orderBy(col("t")).repartition(7))
    assert((np, sp, xp) == ((nu, su, xu)))
    // a single changed row changes the digest
    val (_, sc, _) = dig(a.withColumn("t",
      when(col("id") === 2L, lit("Y")).otherwise(col("t"))))
    assert(sc != sa, "content change must move the digest")
  }
}
