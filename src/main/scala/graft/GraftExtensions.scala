package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/**
 * SQL surface for the engine's custom Catalyst expressions: with
 * `--conf spark.sql.extensions=graft.GraftExtensions` (or
 * `.withExtensions(GraftExtensions.install)`), every distance kernel and
 * text sketch is callable from plain SQL —
 * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")` — so a
 * SQL-first user gets the same codegen'd kernels as the Scala DSL
 * (`graft.functions.vector` / `graft.functions.text`), with no UDF
 * registration and no serialization penalty.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.install(ext)
}

object GraftExtensions {

  /** Int parameter from a foldable SQL argument (e.g. `shingle_hashes(text, 4)`). */
  private def intArg(e: Expression, fn: String, param: String): Int = e match {
    case Literal(v: Int, _) => v
    case other if other.foldable =>
      other.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case x => throw new IllegalArgumentException(
          s"$fn: $param must be an integer literal, got $x")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn: $param must be a foldable integer literal")
  }

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    require(es.length == n, s"$fn expects $n arguments, got ${es.length}")

  /** (name, usage, builder) for every SQL-exposed expression. */
  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("l2_squared", "l2_squared(a, b) - squared L2 distance between two ARRAY<FLOAT> vectors",
      es => { arity("l2_squared", es, 2); L2SquaredDistance(es(0), es(1)) }),
    ("vec_dot", "vec_dot(a, b) - dot product of two ARRAY<FLOAT> vectors",
      es => { arity("vec_dot", es, 2); DotProduct(es(0), es(1)) }),
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity (0.0 when either norm is zero)",
      es => { arity("cosine_sim", es, 2); CosineSimilarity(es(0), es(1)) }),
    ("vec_norm", "vec_norm(a) - L2 norm of an ARRAY<FLOAT> vector",
      es => { arity("vec_norm", es, 1); VectorNorm(es(0)) }),
    ("pq_adc_distance", "pq_adc_distance(lut, code) - PQ asymmetric distance via LUT lookups",
      es => { arity("pq_adc_distance", es, 2); PqAdcDistance(es(0), es(1)) }),
    ("int8_quant_stats", "int8_quant_stats(a) - int8 quantization stats struct for a vector",
      es => { arity("int8_quant_stats", es, 1); Int8QuantStatsExpr(es(0)) }),
    ("shingle_hashes", "shingle_hashes(text, k) - distinct hashes of the word k-grams",
      es => { arity("shingle_hashes", es, 2)
        ShingleHashesExpr(es(0), intArg(es(1), "shingle_hashes", "k")) }),
    ("gram_sketch", "gram_sketch(text, k, n) - n smallest distinct word-k-gram hashes",
      es => { arity("gram_sketch", es, 3)
        GramSketchExpr(es(0), intArg(es(1), "gram_sketch", "k"),
          intArg(es(2), "gram_sketch", "n")) }),
    ("simhash64", "simhash64(text) - 64-bit SimHash of the token stream",
      es => { arity("simhash64", es, 1); SimHash64Expr(es(0)) }),
    ("md5_lower64", "md5_lower64(s) - low 64 bits of md5 as signed LONG (= DuckDB md5_number_lower)",
      es => { arity("md5_lower64", es, 1); Md5Lower64Expr(es(0)) }),
    ("repetition_stats", "repetition_stats(text) - STRUCT(dup_line_ratio, top_bigram_ratio)",
      es => { arity("repetition_stats", es, 1); RepetitionStatsExpr(es(0)) }),
    ("aho_counts",
      "aho_counts(text, patterns) - per-pattern occurrence counts (Aho-Corasick, one pass)",
      es => { arity("aho_counts", es, 2); AhoCountsExpr(es(0), es(1)) }),
    ("pq_encode", "pq_encode(vec, centroids, m) - PQ code bytes (argmin per subspace)",
      es => { arity("pq_encode", es, 3); PqEncode(es(0), es(1), es(2)) }),
    ("shingle_hashes_pos", "shingle_hashes_pos(text, k) - word-k-gram hashes in token order",
      es => { arity("shingle_hashes_pos", es, 2)
        ShingleHashesPosExpr(es(0), intArg(es(1), "shingle_hashes_pos", "k")) }),
    ("argmin_l2", "argmin_l2(vec, centroids) - index of the nearest centroid row (flat matrix)",
      es => { arity("argmin_l2", es, 2); ArgminL2(es(0), es(1)) }),
    ("zorder2", "zorder2(x, y) - Morton interleave of the low 16 bits of two ints",
      es => { arity("zorder2", es, 2); ZOrder2(es(0), es(1)) }),
    ("hilbert2", "hilbert2(x, y) - order-16 Hilbert-curve position of a 16-bit 2-D point",
      es => { arity("hilbert2", es, 2); Hilbert2(es(0), es(1)) }),
    ("sign_project",
      "sign_project(vec, signs) - dense ±1-matrix projection (row-major signs), 6-dp snapped",
      es => { arity("sign_project", es, 2); SignProject(es(0), es(1)) }),
    ("cosine_sim_i8",
      "cosine_sim_i8(codes, q) - cosine between int8 SQ codes and a float query",
      es => { arity("cosine_sim_i8", es, 2); CosineSimilarityI8(es(0), es(1)) }),
    ("binarize_sign",
      "binarize_sign(vec) - sign bits of a float vector packed 32/word into ARRAY<LONG>",
      es => { arity("binarize_sign", es, 1); BinarizeSign(es(0)) }),
    ("hamming_dist",
      "hamming_dist(a, b) - popcount Hamming distance between packed-word code arrays",
      es => { arity("hamming_dist", es, 2); HammingDistance(es(0), es(1)) })
  )

  /** Injection path for `spark.sql.extensions` / `withExtensions`. */
  def install(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""),
        builder))
    }

  /** Runtime path for an existing session the caller didn't build
    * (idempotent; re-registration replaces the entries). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    fns.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graft.SparkShims.registerFunction(spark, name,
        new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""), builder)
    }
}
