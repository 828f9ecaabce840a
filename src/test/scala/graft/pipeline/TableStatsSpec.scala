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

  test("quality report: planted nulls/dupes/out-of-range each hit exactly their rule") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "O"), (2L, -5.0, "F"), (2L, 20.0, "X"), (null, 30.0, "O"))
      .toDF("k", "price", "status")
    val out = TableStats.qualityReport(df,
        notNullCols = Seq("k"), uniqueCols = Seq("k"),
        predicates = Seq(
          "range:price" -> (col("price") > 0),
          "set:status" -> col("status").isin("O", "F")))
      .collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))).toMap
    assert(out("not_null:k") == ((1L, false)))
    // n - count_distinct = 4 - 2: the dupe AND the null both count
    // (nulls are the not_null rule's finding too, but they are not
    // unique key values either)
    assert(out("unique:k") == ((2L, false)))
    assert(out("range:price") == ((1L, false)))
    assert(out("set:status") == ((1L, false)))
    val clean = TableStats.qualityReport(
      df.filter(col("k") === 1L), Seq("k"), Seq("k"),
      Seq("range:price" -> (col("price") > 0))).collect()
    assert(clean.forall(_.getAs[Boolean]("passed")))
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
