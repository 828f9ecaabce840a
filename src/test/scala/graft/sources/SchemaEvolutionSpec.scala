package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sevo_spec_$name").getAbsolutePath

  test("missing columns take defaults; present NULLs take defaults; values pass through") {
    val root = tmp("basic")
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .write.mode("overwrite").parquet(s"$root/gen=1")
    Seq((3L, "c", "en"), (4L, "d", null))
      .toDF("id", "text", "lang")
      .write.mode("overwrite").parquet(s"$root/gen=2")
    val out = SchemaEvolution.readEvolved(spark, root, Map("lang" -> lit("und")))
      .select("id", "lang").as[(Long, String)].collect().toMap
    // gen-1 rows (column absent) AND the gen-2 NULL both default
    assert(out == Map(1L -> "und", 2L -> "und", 3L -> "en", 4L -> "und"))
  }

  test("a default for a column no generation has yet is added outright") {
    val root = tmp("newcol")
    Seq((1L, "a")).toDF("id", "text").write.mode("overwrite").parquet(s"$root/gen=1")
    val out = SchemaEvolution.readEvolved(spark, root,
      Map("quality" -> lit(0.5)))
    assert(out.columns.contains("quality"))
    assert(out.select("quality").as[Double].collect().sameElements(Array(0.5)))
  }

  test("incompatible type change fails loudly, not silently") {
    val root = tmp("conflict")
    Seq((1L, 10)).toDF("id", "score").write.mode("overwrite").parquet(s"$root/gen=1")
    Seq((2L, "high")).toDF("id", "score").write.mode("overwrite").parquet(s"$root/gen=2")
    val e = intercept[Exception] {
      SchemaEvolution.readEvolved(spark, root, Map.empty).collect()
    }
    assert(e.getMessage != null)
  }
}
