package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text-sketching expressions for the dedup operators.
 *
 * Why custom expressions and not composed built-ins: a shingle set built
 * from `transform(sequence(...), i -> slice(split(text), i, k))` gets its
 * tokenizer INLINED into every array position by CollapseProject — the
 * regex split of the text re-executes once per shingle per consumer
 * (observed 15× slowdown at sf0.1). These kernels tokenize once per row
 * and do the rest imperatively, exactly the preference order of
 * SURVEY.md §7.3 ("custom Catalyst Expression" tier).
 *
 * `CodegenFallback` is deliberate: the kernel is string processing with no
 * per-field arithmetic for Janino to fuse; the surrounding operators stay
 * inside whole-stage codegen.
 */
private object TextKernels {
  final val HashSeed = 42L

  def tokenize(text: UTF8String): Array[String] =
    text.toString.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  def hashString(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, HashSeed)
  }

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian uint64 of MD5 bytes 8..15 — bit-identical to DuckDB's
    * `md5_number_lower`, so sketches built on it are SQL-oracle-checkable
    * hash-for-hash across engines. */
  def md5Lower64(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (bytes(i) & 0xffL); i -= 1 }
    h
  }

  /** Winnowing-style document sketch: the `n` smallest distinct hashes of
    * the sliding word-`k`-gram window (order-independent, robust to small
    * edits). Hash = md5Lower64 >>> 1 — 63 bits, so signed-LONG ordering
    * equals DuckDB's unsigned `md5_number_lower(g) >> 1` ordering and the
    * whole sketch is SQL-oracle-checkable hash-for-hash. */
  def gramSketch(text: UTF8String, k: Int, n: Int): Array[Long] = {
    val toks = tokenize(text)
    val grams =
      if (toks.length < k) Array(toks.mkString(" "))
      else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))
    grams.map(g => md5Lower64(g) >>> 1).distinct.sorted.take(n)
  }

  /** Distinct hashed word-k-grams; short texts hash as one gram. */
  def shingles(text: UTF8String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    val grams =
      if (toks.length < k) Array(hashString(toks.mkString(" ")))
      else Array.tabulate(toks.length - k + 1)(i => hashString(toks.slice(i, i + k).mkString(" ")))
    grams.distinct
  }
}

/** Low 64 bits of md5 as a signed LONG — the scalar form of the token
  * hash every sketch in this codebase shares with DuckDB's
  * `md5_number_lower` (byte order matches TextKernels.md5Lower64), so
  * sketch structures built from it (count-min cells, HLL registers) are
  * recomputable hash-for-hash in oracle SQL. */
case class Md5Lower64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_lower64"

  override def nullSafeEval(input: Any): Any =
    TextKernels.md5Lower64(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ARRAY<BIGINT> of distinct hashed word-`k`-grams of a text column. */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextKernels.shingles(input.asInstanceOf[UTF8String], k))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ARRAY<BIGINT> of hashed word-`k`-grams in TOKEN ORDER, one per start
  * position, NOT deduplicated — the positional variant of
  * ShingleHashesExpr for span-level operators (element i is the gram
  * starting at token i; texts shorter than k hash as one whole-text gram
  * at position 0). */
case class ShingleHashesPosExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_pos"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String])
    val grams =
      if (toks.length < k) Array(TextKernels.hashString(toks.mkString(" ")))
      else Array.tabulate(toks.length - k + 1)(i =>
        TextKernels.hashString(toks.slice(i, i + k).mkString(" ")))
    new GenericArrayData(grams)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ARRAY<BIGINT> sketch of the `n` smallest distinct word-`k`-gram hashes
  * (TextKernels.gramSketch), ascending. */
case class GramSketchExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_sketch"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextKernels.gramSketch(input.asInstanceOf[UTF8String], k, n))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over a shingle-hash array: for permutation (a_i, b_i),
  * min over shingles of (a_i·(h mod p) + b_i) mod p. */
case class MinHashSignatureExpr(child: Expression, params: Seq[(Long, Long)])
    extends UnaryExpression with CodegenFallback {
  private val Prime = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData].toLongArray()
    val sig = new Array[Long](params.length)
    var i = 0
    while (i < params.length) {
      val (a, b) = params(i)
      var best = Long.MaxValue
      var j = 0
      while (j < shingles.length) {
        val h = java.lang.Math.floorMod(shingles(j), Prime)
        val v = java.lang.Math.floorMod(a * h + b, Prime)
        if (v < best) best = v
        j += 1
      }
      sig(i) = if (shingles.isEmpty) 0L else best
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a text column packed into a LONG: each token's hash
  * bits vote +1/-1 per position; the sign becomes the bit. Token hash is
  * md5Lower64 (NOT xxhash64) so the whole fingerprint — and therefore the
  * pair Hamming distances — can be recomputed in DuckDB SQL for the
  * correctness gate. */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String])
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextKernels.md5Lower64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Gopher-style repetition quality signals in ONE pass over the text:
  * STRUCT(dup_line_ratio DOUBLE, top_bigram_ratio DOUBLE).
  *
  *  - dup_line_ratio: fraction of non-empty trimmed lines that repeat an
  *    earlier line — boilerplate/navigation detection;
  *  - top_bigram_ratio: fraction of the doc's word-bigrams taken by its
  *    single most frequent bigram — loop/babble detection.
  *
  * Both are integer-ratio doubles (bit-exact across engines, no
  * rounding). Line trimming strips exactly ' ', '\t', '\r' so DuckDB's
  * `trim(l, ' \t\r')` reproduces it byte-for-byte (Java's String.trim
  * strips all control chars ≤ U+0020 — NOT cross-engine-stable). */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("dup_line_ratio", DoubleType, nullable = false),
    StructField("top_bigram_ratio", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  private def trimLight(s: String): String = {
    var a = 0
    var b = s.length
    def soft(c: Char) = c == ' ' || c == '\t' || c == '\r'
    while (a < b && soft(s.charAt(a))) a += 1
    while (b > a && soft(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val lines = u.toString.split("\n", -1).map(trimLight).filter(_.nonEmpty)
    val dupLine =
      if (lines.isEmpty) 0.0
      else (lines.length - lines.distinct.length).toDouble / lines.length
    val toks = TextKernels.tokenize(u)
    val topBigram =
      if (toks.length < 2) 0.0
      else {
        val counts = new java.util.HashMap[String, Integer]()
        var max = 0
        var i = 0
        while (i < toks.length - 1) {
          val c = counts.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
          if (c > max) max = c
          i += 1
        }
        max.toDouble / (toks.length - 1)
      }
    InternalRow(dupLine, topBigram)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Quality-signal counts in ONE pass over the text:
  * STRUCT(len, n_tokens, n_punct, n_digit, n_stop) — the integer inputs
  * of `TextAnalysis.qualityScore`, which previously paid three separate
  * regexp passes plus a split per row (the dominant stage of the
  * 1M-doc pipeline rehearsal, BASELINE.md round 15).
  *
  * Exact Column-API parity by construction: `len` = numChars (Spark
  * `length`); punct class is the literal `[.,!?;:'"()\-]` and digits
  * `[0-9]`, counted on the RAW text (what the regexp_replace
  * length-difference measured); tokens are maximal runs of
  * non-`[ \t\n\f\r]` chars (Java `\s`) of the `lower()`ed text
  * (leading-trim is irrelevant once empty tokens are dropped), and
  * `n_stop` compares each lowered token against the caller's stopword
  * set. All counts are exact integers, so the float chain composed on
  * top of the struct is bit-identical to the regex formulation. */
case class QualityStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("len", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "quality_stats"

  @transient private lazy val sw: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | '!' | '?' | ';' | ':' | '\'' | '"' | '(' | ')' | '-' => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val raw = u.toString
    var np = 0L
    var nd = 0L
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (isPunct(c)) np += 1
      else if (c >= '0' && c <= '9') nd += 1
      i += 1
    }
    val low = u.toLowerCase.toString
    var nt = 0L
    var ns = 0L
    var j = 0
    val n2 = low.length
    while (j < n2) {
      while (j < n2 && isWs(low.charAt(j))) j += 1
      if (j < n2) {
        val start = j
        while (j < n2 && !isWs(low.charAt(j))) j += 1
        nt += 1
        if (sw.contains(low.substring(start, j))) ns += 1
      }
    }
    InternalRow(u.numChars().toLong, nt, np, nd, ns)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points. */
/**
 * Content-defined chunk spans of a text's RAW whitespace tokens (no
 * lowercasing — the [[graft.pipeline.Chunker]] tokenization, unlike the
 * sketch kernels above): one struct (s, e) of inclusive token positions
 * per chunk, where a boundary falls AFTER token t iff
 * `(md5Lower64(t) >>> 1) mod avg == 0`. A single pass — tokenize once,
 * one md5 per token — where the composed `filter`/`concat`/`element_at`
 * Column formulation re-evaluated the md5 scan per consumer AND dropped
 * the whole projection to interpreted mode (higher-order functions are
 * CodegenFallback; measured ~9 s vs ~1 s at sf0.1). A trailing-gate
 * empty final span is dropped inside the kernel, so positions stay
 * contiguous and `posexplode` ordinals are the chunk index.
 */
case class CdcSpansExpr(child: Expression, avg: Int)
    extends UnaryExpression with CodegenFallback {
  require(avg >= 2, "avg must be >= 2")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_spans"

  // Child is the PRE-SPLIT token array (array<string>), not the raw
  // text: the caller's one whitespace split feeds both this kernel and
  // the chunk_fp slicing, so the regex split runs exactly once per row.
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var s = 0
      var i = 0
      while (i < n) {
        if ((TextKernels.md5Lower64(arr.getUTF8String(i).toString) >>> 1) % avg == 0) {
          out += org.apache.spark.sql.catalyst.InternalRow(s, i)
          s = i + 1
        }
        i += 1
      }
      if (s <= n - 1) out += org.apache.spark.sql.catalyst.InternalRow(s, n - 1)
      new GenericArrayData(out.toArray)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Character-level Shannon entropy in ONE pass over the text:
  * STRUCT(n_cps BIGINT, n_distinct BIGINT, entropy DOUBLE).
  *
  * The classic gibberish/binary-junk quality dial (low entropy =
  * repeated-char padding, high ≈ ln(alphabet) = encrypted/base64 blobs).
  * Counting is by Unicode CODEPOINT (surrogate pairs consumed whole) so
  * DuckDB's codepoint-wise `regexp_split_to_array(text, '')` reproduces
  * the alphabet exactly. The entropy is computed as
  * `ln(n) − Σ c·ln(c) / n` with the Σ taken in ASCENDING CODEPOINT order
  * — a deterministic summation order, so the double is reproducible
  * run-to-run; gates round to 6 decimals for the cross-engine compare
  * (the house rule for transcendental outputs, e.g. lang_entropy in
  * pipeline_data_cards). */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("n_cps", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    val entropy =
      if (n == 0L) 0.0
      else {
        var slk = 0.0
        val it = counts.values().iterator()
        while (it.hasNext) { val c = it.next(); slk += c * math.log(c.toDouble) }
        math.log(n.toDouble) - slk / n
      }
    InternalRow(n, counts.size.toLong, entropy)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Aho–Corasick automaton (Aho & Corasick 1975): one pass over the text
 * matches EVERY pattern of a dictionary simultaneously — the scale answer
 * to blocklist / decontamination-term filtering, where k patterns as k
 * regex/contains passes would re-scan the corpus k times. Counts ALL
 * occurrences (one per match END position, overlapping included), each
 * pattern independently — "data" inside "database" counts for both when
 * both are in the dictionary.
 *
 * Build is the textbook goto/fail/output construction over UTF-16 chars;
 * the per-node output list is closed over the fail chain during the BFS,
 * so the scan never walks fail links for reporting — O(text + matches).
 */
private[functions] final class AhoAutomaton(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "aho automaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "aho patterns must be non-empty")

  private val goto = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Char, Int]())
  private val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      val nxt = goto(s).get(c)
      s = if (goto(s).containsKey(c)) nxt
      else {
        goto += new java.util.HashMap[Char, Int]()
        ends += Nil
        goto(s).put(c, goto.size - 1)
        goto.size - 1
      }
      i += 1
    }
    ends(s) = pi :: ends(s)
  }

  private val n = goto.size
  private val fail = new Array[Int](n)
  /** pattern ids reported at each node: own ends ∪ out(fail) (BFS closure) */
  private val out: Array[Array[Int]] = new Array[Array[Int]](n)
  locally {
    out(0) = ends(0).toArray
    val q = new java.util.ArrayDeque[Int]()
    goto(0).forEach { (_, v) =>
      fail(v) = 0
      out(v) = (ends(v) ++ out(0).toList).toArray
      q.add(v)
    }
    while (!q.isEmpty) {
      val u = q.poll()
      goto(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).containsKey(c)) f = fail(f)
        fail(v) = if (goto(f).containsKey(c) && goto(f).get(c) != v) goto(f).get(c) else 0
        out(v) = (ends(v) ++ out(fail(v)).toList).toArray
        q.add(v)
      }
    }
  }

  /** Per-pattern occurrence counts over one text, index-aligned with the
    * constructor's pattern order. */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !goto(s).containsKey(c)) s = fail(s)
      if (goto(s).containsKey(c)) s = goto(s).get(c)
      val o = out(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

/** ARRAY<BIGINT> of per-pattern occurrence counts (all match positions,
  * overlapping included) of a FOLDABLE ARRAY<STRING> dictionary over a
  * text column — one [[AhoAutomaton]] pass per row, built once per
  * executor. The multi-pattern blocklist/decontamination primitive. */
case class AhoCountsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "aho_counts"

  @transient private lazy val automaton = {
    require(right.foldable, "aho_counts: the pattern dictionary must be a literal array")
    val ad = right.eval().asInstanceOf[ArrayData]
    require(ad != null, "aho_counts: the pattern dictionary must not be NULL")
    new AhoAutomaton(Array.tabulate(ad.numElements())(i => ad.getUTF8String(i).toString))
  }

  override def nullSafeEval(t: Any, patternsIgnored: Any): Any =
    new GenericArrayData(automaton.countAll(t.asInstanceOf[UTF8String].toString))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object text {
  def aho_counts(c: Column, patterns: Seq[String]): Column =
    SparkShims.column(AhoCountsExpr(SparkShims.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        patterns, ArrayType(StringType, containsNull = false))))
  def char_entropy(c: Column): Column =
    SparkShims.column(CharEntropyExpr(SparkShims.expression(c)))
  def cdc_spans(c: Column, avg: Int): Column =
    SparkShims.column(CdcSpansExpr(SparkShims.expression(c), avg))
  def shingle_hashes(c: Column, k: Int): Column =
    SparkShims.column(ShingleHashesExpr(SparkShims.expression(c), k))
  def shingle_hashes_pos(c: Column, k: Int): Column =
    SparkShims.column(ShingleHashesPosExpr(SparkShims.expression(c), k))
  def gram_sketch(c: Column, k: Int, n: Int): Column =
    SparkShims.column(GramSketchExpr(SparkShims.expression(c), k, n))
  def minhash_signature(c: Column, params: Seq[(Long, Long)]): Column =
    SparkShims.column(MinHashSignatureExpr(SparkShims.expression(c), params))
  def simhash64(c: Column): Column =
    SparkShims.column(SimHash64Expr(SparkShims.expression(c)))
  def md5_lower64(c: Column): Column =
    SparkShims.column(Md5Lower64Expr(SparkShims.expression(c)))
  def repetition_stats(c: Column): Column =
    SparkShims.column(RepetitionStatsExpr(SparkShims.expression(c)))
  def quality_stats(c: Column, stopwords: Seq[String]): Column =
    SparkShims.column(QualityStatsExpr(SparkShims.expression(c), stopwords))
}
