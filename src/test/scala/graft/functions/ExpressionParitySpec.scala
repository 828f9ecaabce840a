package graft.functions

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Interpreted-vs-codegen parity for every SQL-exposed custom expression.
 *
 * Each expression ships TWO evaluation paths: `nullSafeEval` (interpreted)
 * and `doGenCode` (whole-stage codegen — the path the 100 TB perf story
 * rides on). They are independent implementations of the same kernel, so
 * parity is a real invariant, not a tautology: a drift bug would make
 * results depend on whether Catalyst happened to compile the stage
 * (codegen silently falls back on compilation errors or >64 KB methods).
 *
 * Method: the same SQL projection over edge-case rows (empty vectors,
 * zero norms, mismatched lengths, NaN/Infinity components, NULLs) is
 * collected under spark.sql.codegen.factoryMode=CODEGEN_ONLY and
 * NO_CODEGEN (+ wholeStage off) and compared BIT-EXACTLY (doubles via
 * raw bits, so NaN == NaN and -0.0 != 0.0).
 */
class ExpressionParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def collectUnder(mode: String, wholeStage: Boolean, sql: String): Seq[Row] = {
    val conf = spark.conf
    val prevMode = conf.getOption("spark.sql.codegen.factoryMode")
    val prevWs = conf.getOption("spark.sql.codegen.wholeStage")
    try {
      conf.set("spark.sql.codegen.factoryMode", mode)
      conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      spark.sql(sql).collect().toSeq
    } finally {
      prevMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      prevWs.fold(conf.unset("spark.sql.codegen.wholeStage"))(
        conf.set("spark.sql.codegen.wholeStage", _))
    }
  }

  /** Bit-exact value compare: doubles by raw long bits, arrays elementwise. */
  private def sameValue(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y)
    case (x: Float, y: Float) =>
      java.lang.Float.floatToRawIntBits(x) == java.lang.Float.floatToRawIntBits(y)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => sameValue(u, v) }
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Row, y: Row) =>
      x.length == y.length && (0 until x.length).forall(i => sameValue(x(i), y(i)))
    case (x, y) => x == y
  }

  private def assertParity(sql: String): Unit = {
    val gen = collectUnder("CODEGEN_ONLY", wholeStage = true, sql)
    val interp = collectUnder("NO_CODEGEN", wholeStage = false, sql)
    assert(gen.length == interp.length, s"row counts differ for:\n$sql")
    gen.zip(interp).zipWithIndex.foreach { case ((g, i), idx) =>
      assert(sameValue(g, i), s"row $idx differs: codegen=$g interpreted=$i\nfor:\n$sql")
    }
  }

  private val edgeVectors =
    """VALUES
      |  (0, array(1.0F, 2.0F, 3.0F),        array(4.0F, -5.0F, 6.0F)),
      |  (1, array(),                        array()),
      |  (2, array(0.0F, 0.0F),              array(0.0F, 0.0F)),
      |  (3, array(1.0F, 2.0F, 3.0F, 4.0F),  array(1.0F, 2.0F)),
      |  (4, array(float('NaN'), 1.0F),      array(1.0F, float('Infinity'))),
      |  (5, array(-0.0F, 1.0E-38F),         array(0.0F, -1.0E38F)),
      |  (6, CAST(NULL AS ARRAY<FLOAT>),     array(1.0F, 2.0F)),
      |  (7, array(1.0F, 2.0F),              CAST(NULL AS ARRAY<FLOAT>))
      |  AS t(id, a, b)""".stripMargin

  test("float-vector kernels: codegen == interpreted bit-exactly on edge inputs") {
    assertParity(
      s"""SELECT id, l2_squared(a, b), vec_dot(a, b), cosine_sim(a, b),
         |       vec_norm(a), vec_norm(b)
         |FROM ($edgeVectors) ORDER BY id""".stripMargin)
  }

  test("binarize_sign + hamming_dist parity (packed words, sign of -0.0 and NaN)") {
    assertParity(
      s"""SELECT id, binarize_sign(a), binarize_sign(b),
         |       CASE WHEN a IS NOT NULL AND b IS NOT NULL
         |            THEN hamming_dist(binarize_sign(a), binarize_sign(b)) END
         |FROM ($edgeVectors) ORDER BY id""".stripMargin)
  }

  test("argmin_l2 / pq_encode / pq_adc_distance / sign_project parity") {
    // 2 centroids of dim 2 flat-packed; code bytes index the LUT
    assertParity(
      """SELECT id,
        |  argmin_l2(v, array(0.0F,0.0F, 1.0F,1.0F)),
        |  pq_encode(v, array(0.0F,0.0F, 1.0F,1.0F), 1),
        |  pq_adc_distance(array(0.5D, 1.5D), pq_encode(v, array(0.0F,0.0F, 1.0F,1.0F), 1)),
        |  sign_project(v, array(1.0D, -1.0D, -1.0D, 1.0D))
        |FROM VALUES
        |  (0, array(0.1F, 0.1F)),
        |  (1, array(0.5F, 0.5F)),
        |  (2, array(0.9F, 1.1F)),
        |  (3, CAST(NULL AS ARRAY<FLOAT>))
        |  AS t(id, v) ORDER BY id""".stripMargin)
  }

  test("int8 kernels and space-filling curves parity") {
    assertParity(
      """SELECT id,
        |  int8_quant_stats(v),
        |  cosine_sim_i8(CAST(array(127, -128, 0) AS ARRAY<TINYINT>), v),
        |  zorder2(x, y), hilbert2(x, y)
        |FROM VALUES
        |  (0, array(1.0F, -1.0F, 0.5F), 0, 0),
        |  (1, array(0.0F, 0.0F, 0.0F), 65535, 65535),
        |  (2, CAST(NULL AS ARRAY<FLOAT>), 12345, 54321)
        |  AS t(id, v, x, y) ORDER BY id""".stripMargin)
  }

  test("text expressions parity (empty string, punctuation-only, unicode)") {
    assertParity(
      """SELECT id, shingle_hashes(s, 2), shingle_hashes_pos(s, 2),
        |  gram_sketch(s, 2, 4), simhash64(s), md5_lower64(s), repetition_stats(s),
        |  aho_counts(s, array('the', 'o', 'a a', 'wörld', '---'))
        |FROM VALUES
        |  (0, 'the quick brown fox jumps over the lazy dog'),
        |  (1, ''),
        |  (2, '!!! ... ---'),
        |  (3, 'a a a a a a'),
        |  (4, 'héllo wörld héllo wörld'),
        |  (5, CAST(NULL AS STRING))
        |  AS t(id, s) ORDER BY id""".stripMargin)
  }
}
