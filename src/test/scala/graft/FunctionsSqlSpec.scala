package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface (GraftExtensions): every custom kernel
  * callable from SQL text, literal-parameter validation, value parity
  * with the Scala DSL. */
class FunctionsSqlSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; GraftExtensions.register(s); s }

  test("vector kernels are callable from SQL and match the DSL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f))).toDF("id", "a", "b")
    df.createOrReplaceTempView("graft_fn_sql_v")
    val viaSql = spark.sql(
      """SELECT vec_norm(a) AS n, cosine_sim(a, b) AS c,
        |  l2_squared(a, b) AS l2, vec_dot(a, b) AS d
        |FROM graft_fn_sql_v""".stripMargin)
      .as[(Double, Double, Double, Double)].head()
    val viaDsl = df.select(
      graft.functions.vector.vec_norm(col("a")),
      graft.functions.vector.cosine_sim(col("a"), col("b")),
      graft.functions.vector.l2_squared(col("a"), col("b")),
      graft.functions.vector.vec_dot(col("a"), col("b")))
      .as[(Double, Double, Double, Double)].head()
    assert(viaSql == viaDsl)
    assert(viaSql._1 == 3.0 && viaSql._4 == 2.0)
  }

  test("text sketches are callable from SQL; zero-norm cosine is 0.0") {
    import spark.implicits._
    Seq(("a b c d e", Array(0.0f, 0.0f), Array(1.0f, 1.0f)))
      .toDF("t", "z", "v").createOrReplaceTempView("graft_fn_sql_t")
    val row = spark.sql(
      """SELECT size(shingle_hashes(t, 3)) AS ns, simhash64(t) AS sh,
        |  size(gram_sketch(t, 4, 8)) AS gs,
        |  repetition_stats(t).dup_line_ratio AS dlr,
        |  cosine_sim(z, v) AS zc
        |FROM graft_fn_sql_t""".stripMargin)
      .as[(Int, Long, Int, Double, Double)].head()
    assert(row._1 == 3) // 5 tokens → 3 distinct trigrams
    assert(row._3 == 2) // 5 tokens → 2 distinct 4-grams
    assert(row._5 == 0.0)
  }

  test("binarize_sign and hamming_dist are callable from SQL and match the DSL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Array(1.0f, -1.0f, 0.0f, 2.0f), Array(1.0f, 1.0f, -1.0f, -2.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("graft_fn_sql_h")
    val viaSql = spark.sql(
      """SELECT binarize_sign(a) AS ca,
        |  hamming_dist(binarize_sign(a), binarize_sign(b)) AS hd
        |FROM graft_fn_sql_h""".stripMargin)
      .as[(Seq[Long], Long)].head()
    val viaDsl = df.select(
      graft.functions.vector.binarize_sign(col("a")),
      graft.functions.vector.hamming_dist(
        graft.functions.vector.binarize_sign(col("a")),
        graft.functions.vector.binarize_sign(col("b"))))
      .as[(Seq[Long], Long)].head()
    assert(viaSql == viaDsl)
    // a -> bits 1,0,0,1 (strict positivity: 0.0f -> 0) = 0b1001 = 9
    assert(viaSql._1 === Seq(9L))
    // b -> bits 1,1,0,0 = 12; 9 xor 12 = 0b0101 -> 2 differing bits
    assert(viaSql._2 === 2L)
  }

  test("pq_encode and shingle_hashes_pos are callable from SQL and match the DSL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, typedlit}
    // m=2, k=2, subDim=1: centroids (0,[0]) (0,[10]) / (1,[0]) (1,[10])
    val cents = Seq(0.0f, 10.0f, 0.0f, 10.0f)
    val df = Seq((Array(9.0f, 1.0f), "a b c d")).toDF("v", "t")
    df.createOrReplaceTempView("graft_fn_sql_p")
    val viaSql = spark.sql(
      "SELECT pq_encode(v, array(0.0F, 10.0F, 0.0F, 10.0F), 2) AS code, " +
        "shingle_hashes_pos(t, 2) AS sh FROM graft_fn_sql_p")
      .as[(Array[Byte], Array[Long])].head()
    val viaDsl = df.select(
      graft.functions.vector.pq_encode(col("v"), typedlit(cents), lit(2)),
      graft.functions.text.shingle_hashes_pos(col("t"), 2))
      .as[(Array[Byte], Array[Long])].head()
    assert(viaSql._1.toSeq == viaDsl._1.toSeq && viaSql._1.toSeq == Seq[Byte](1, 0))
    assert(viaSql._2.toSeq == viaDsl._2.toSeq && viaSql._2.length == 3)
  }

  test("argmin_l2 matches the unrolled least(struct) form incl. tie-break, SQL == DSL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, least, lit, struct, typedlit}
    // 4 centroids of dim 2; vec (5,5) ties centroids 1 and 2 exactly →
    // lower index must win
    val cents = Seq(0.0f, 0.0f, 4.0f, 4.0f, 6.0f, 6.0f, 100.0f, 100.0f)
    val df = Seq(
      (Array(5.0f, 5.0f), 1),   // tie between c1 (d=2) and c2 (d=2)
      (Array(0.1f, -0.1f), 0),
      (Array(99.0f, 101.0f), 3)).toDF("v", "want")
    df.createOrReplaceTempView("graft_fn_sql_am")
    val viaSql = spark.sql(
      "SELECT argmin_l2(v, array(0.0F,0.0F,4.0F,4.0F,6.0F,6.0F,100.0F,100.0F)) " +
        "AS c, want FROM graft_fn_sql_am").as[(Int, Int)].collect()
    assert(viaSql.forall { case (got, want) => got == want }, viaSql.toSeq)
    val unrolled = (0 until 4).map { c =>
      struct(graft.functions.vector.l2_squared(col("v"),
        typedlit(cents.slice(c * 2, c * 2 + 2))).as("d"), lit(c).as("c"))
    }
    val both = df.select(
      graft.functions.vector.argmin_l2(col("v"), typedlit(cents)).as("fast"),
      least(unrolled: _*).getField("c").as("slow")).as[(Int, Int)].collect()
    assert(both.forall { case (f, s) => f == s }, both.toSeq)
  }

  test("non-literal sketch parameters are rejected with a clear error") {
    import spark.implicits._
    Seq(("a b c", 3)).toDF("t", "k").createOrReplaceTempView("graft_fn_sql_e")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(t, k) FROM graft_fn_sql_e").collect()
    }
    assert(e.getMessage.contains("foldable integer literal")
      || Option(e.getCause).exists(_.getMessage.contains("foldable integer literal")))
  }
}
