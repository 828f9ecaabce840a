package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the distance kernels (SURVEY.md §2.7;
 * reference: Distances.java:31-153) and PQ ADC lookup
 * (reference: FdbVectorIndex.java:1057-1079).
 *
 * These participate in whole-stage codegen (`doGenCode`), so distance
 * computations stay inside the generated loop with no boxing or UDF
 * serialization — the main perf lever for brute-force / rerank scans at
 * 100 TB scale (SURVEY.md §4 "SIMD vectorized kernels" row).
 *
 * Accumulation: double, sequential in index order — bit-deterministic and
 * identical to graft.core.Distances and to a double-lambda DuckDB oracle.
 */
trait VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
}

/** Squared L2 distance between two float arrays (reference: Distances.java:48-64). */
case class L2SquaredDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_squared"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Dot product (reference: Distances.java:103-118). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine similarity; 0.0 if either norm is 0 (reference: Distances.java:149-153). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** L2 norm of one float array (reference: Distances.java:126-140). */
case class VectorNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * PQ asymmetric-distance-computation lookup
 * (reference: FdbVectorIndex.java:1057-1065 `pqApproxDistance`).
 *
 * left:  flattened LUT ARRAY<DOUBLE> of length M*K — lut[m*K + c] is the
 *        squared sub-distance of the query's m-th subvector to centroid c.
 * right: BINARY code of length M (one centroid id per subspace).
 * result: Σ_m lut[m*K + (code[m] & 0xFF)].
 */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(DoubleType), BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Array[Byte]]
    val m = code.length
    if (m == 0) return 0.0
    val k = lut.numElements() / m
    var acc = 0.0
    var i = 0
    while (i < m) {
      acc += lut.getDouble(i * k + (code(i) & 0xff))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.length;
         |double $acc = 0.0;
         |if ($m > 0) {
         |  int $k = $a.numElements() / $m;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += $a.getDouble($i * $k + ($b[$i] & 0xff));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/**
 * PQ encoding: nearest centroid per subspace by squared L2
 * (reference: pq/PqEncoder.java:18-38), as a codegen'd column so index
 * builds encode inside the scan's generated loop — one pass over the
 * corpus, no UDF serialization.
 *
 * first:  embedding ARRAY<FLOAT> of length m*subDim.
 * second: flat codebook ARRAY<FLOAT> of length m*k*subDim (centroid (s,c)
 *         starts at (s*k + c)*subDim — graft.index.Pq.Codebook layout),
 *         a broadcast-sized literal.
 * third:  m (number of subspaces; foldable INT).
 * result: BINARY code of length m, code[s] = argmin_c ||sub_s - cent||².
 * Ties break toward the lower centroid id (strict `<`), matching
 * Pq.encode; k must be ≤ 256 so a centroid id fits one byte.
 */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType), ArrayType(FloatType), IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  /** The codebook is almost always a literal (typedlit of the trained
    * centroids). Flatten it to a primitive float[] ONCE: ArrayData
    * .getFloat on a 200k-element GenericArrayData literal boxes per
    * access — at dim 768 / m 16 / k 256 that is 2e5 boxed reads PER ROW
    * in the build scan's hot loop. */
  @transient private lazy val foldedCents: Array[Float] =
    if (second.foldable) {
      val ad = second.eval(null)
      if (ad == null) null else ad.asInstanceOf[ArrayData].toFloatArray()
    } else null

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val cents =
      if (foldedCents != null) foldedCents
      else b.asInstanceOf[ArrayData].toFloatArray()
    val m = c.asInstanceOf[Int]
    val dim = emb.numElements()
    val subDim = dim / m
    val k = if (m * subDim == 0) 0 else cents.length / (m * subDim)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var cc = 0
      while (cc < k) {
        val cOff = (s * k + cc) * subDim
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = emb.getFloat(off + i).toDouble - cents(cOff + i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = cc }
        cc += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val subDim = ctx.freshName("subDim")
      val k = ctx.freshName("k")
      val cents = ctx.freshName("cents")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val cc = ctx.freshName("cc")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val cOff = ctx.freshName("cOff")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      // foldable codebook → one shared primitive array; otherwise one
      // unboxing copy per row (still beats per-access boxing in the
      // O(m*k*subDim) loop)
      val centsInit =
        if (second.foldable && foldedCents != null)
          s"float[] $cents = ${ctx.addReferenceObj("pqCents", foldedCents, "float[]")};"
        else
          s"float[] $cents = $b.toFloatArray();"
      s"""
         |$centsInit
         |int $subDim = $c == 0 ? 0 : $a.numElements() / $c;
         |int $k = ($c * $subDim) == 0 ? 0 : $cents.length / ($c * $subDim);
         |byte[] $out = new byte[$c];
         |for (int $s = 0; $s < $c; $s++) {
         |  int $off = $s * $subDim;
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $cc = 0; $cc < $k; $cc++) {
         |    int $cOff = ($s * $k + $cc) * $subDim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $d = (double) $a.getFloat($off + $i) - (double) $cents[$cOff + $i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $cc; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, sE: Expression, t: Expression): Expression = copy(f, sE, t)
}

/**
 * argmin over a FLATTENED centroid matrix: the index c ∈ [0, k) whose
 * row minimizes squared L2 against `left` (k = centroids.length / dim;
 * ties break toward the lower index, matching `least()` on (d, c)
 * structs and Pq.encode).
 *
 * This is the cluster-assignment kernel for IVF builds. It exists
 * because composing it from built-ins — least(struct(l2_squared(emb,
 * cent_c), c) for every c) — inlines nlist independent distance kernels
 * into one generated method: at nlist=64 / dim=768 that method blows
 * past HotSpot's JIT size limits and runs interpreted (~100× slower;
 * observed 29 min for a 50k-row build). One compact loop stays
 * JIT-friendly at any (nlist, dim). A foldable centroid argument is
 * flattened to a primitive float[] once and shared via a codegen
 * reference — no per-row boxing on the literal.
 */
case class ArgminL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_l2"

  @transient private lazy val foldedCents: Array[Float] =
    if (right.foldable) {
      val ad = right.eval(null)
      if (ad == null) null else ad.asInstanceOf[ArrayData].toFloatArray()
    } else null

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents =
      if (foldedCents != null) foldedCents
      else b.asInstanceOf[ArrayData].toFloatArray()
    val dim = vec.numElements()
    val k = if (dim == 0) 0 else cents.length / dim
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val d = vec.getFloat(i).toDouble - cents(off + i).toDouble
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cents = ctx.freshName("cents")
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val centsInit =
        if (right.foldable && foldedCents != null)
          s"float[] $cents = ${ctx.addReferenceObj("ivfCents", foldedCents, "float[]")};"
        else
          s"float[] $cents = $b.toFloatArray();"
      s"""
         |$centsInit
         |int $dim = $a.numElements();
         |int $k = $dim == 0 ? 0 : $cents.length / $dim;
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $cents[$off + $i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * Cosine between an int8-quantized code array and a full-precision float
 * query — the SQ8 approximate-scan kernel. Symmetric per-vector
 * quantization (`round(x·127/maxAbs)`) preserves direction up to the
 * rounding grid and the positive scale drops out of cosine, so scanning
 * the 1-byte codes against the raw query needs NO dequantization pass —
 * a 4x narrower scan than float32 with the same loop shape as
 * [[CosineSimilarity]].
 */
case class CosineSimilarityI8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(ByteType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getByte(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getByte($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * Dense sign-matrix projection in ONE compact kernel: `vec` (dIn floats)
 * × a plan-time ±1 matrix (`signs`, row-major dOut×dIn doubles) →
 * dOut-dim double array, each component snapped to 6 decimals
 * (HALF_UP, the k-means convention) so projected values reproduce
 * bit-for-bit in a SQL oracle. An unrolled per-component `Column` sum at
 * dOut×dIn = 2048 terms blows Janino's method limit and drops the whole
 * stage to interpreted mode — this loop stays inside whole-stage
 * codegen at any dimension (same motivation as [[ArgminL2]]).
 */
case class SignProject(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sign_project"

  @transient private lazy val foldedSigns: Array[Double] =
    if (right.foldable) {
      val ad = right.eval(null)
      if (ad == null) null else ad.asInstanceOf[ArrayData].toDoubleArray()
    } else null

  private def project(vec: ArrayData, signs: Array[Double]): Any = {
    val dIn = vec.numElements()
    val dOut = if (dIn == 0) 0 else signs.length / dIn
    val out = new Array[Double](dOut)
    var i = 0
    while (i < dOut) {
      val off = i * dIn
      var acc = 0.0
      var j = 0
      while (j < dIn) {
        acc += signs(off + j) * vec.getFloat(j).toDouble
        j += 1
      }
      out(i) = java.math.BigDecimal.valueOf(acc)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val signs =
      if (foldedSigns != null) foldedSigns
      else b.asInstanceOf[ArrayData].toDoubleArray()
    project(a.asInstanceOf[ArrayData], signs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val signs = ctx.freshName("signs")
      val dIn = ctx.freshName("dIn")
      val dOut = ctx.freshName("dOut")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val signsInit =
        if (right.foldable && foldedSigns != null)
          s"double[] $signs = ${ctx.addReferenceObj("projSigns", foldedSigns, "double[]")};"
        else
          s"double[] $signs = $b.toDoubleArray();"
      s"""
         |$signsInit
         |int $dIn = $a.numElements();
         |int $dOut = $dIn == 0 ? 0 : $signs.length / $dIn;
         |double[] $out = new double[$dOut];
         |for (int $i = 0; $i < $dOut; $i++) {
         |  int $off = $i * $dIn;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dIn; $j++) {
         |    $acc += $signs[$off + $j] * (double) $a.getFloat($j);
         |  }
         |  $out[$i] = java.math.BigDecimal.valueOf($acc)
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * Symmetric per-vector int8 quantization stats in ONE pass:
 * STRUCT(scale, codes_sum, codes_l1, max_abs_err, mse).
 *
 * scale = max|x| / 127; code_i = floor(x_i/scale + 0.5) ∈ [-127, 127];
 * errors measured against the dequantized values. A single expression —
 * not composed built-ins — because the shared `scale` subexpression would
 * be inlined into every element lambda by CollapseProject (O(dim²) work
 * per row). Every operation (float→double cast, max, divide, floor,
 * multiply-subtract, index-order sum) is IEEE-identical in DuckDB list
 * lambdas, so the stats are SQL-oracle-checkable at full precision.
 * Zero vectors yield scale 0 and all-zero stats.
 */
case class Int8QuantStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow

  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes_sum", LongType, nullable = false),
    StructField("codes_l1", LongType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))
  override def prettyName: String = "int8_quant_stats"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    if (m == 0.0 || n == 0) InternalRow(0.0, 0L, 0L, 0.0, 0.0)
    else {
      val scale = m / 127.0
      var sum = 0L
      var l1 = 0L
      var maxErr = 0.0
      var sq = 0.0
      i = 0
      while (i < n) {
        val v = x.getFloat(i).toDouble
        val q = math.floor(v / scale + 0.5).toLong
        val e = v - q * scale
        val ae = math.abs(e)
        if (ae > maxErr) maxErr = ae
        sq += e * e
        sum += q
        l1 += math.abs(q)
        i += 1
      }
      InternalRow(scale, sum, l1, maxErr, sq / n)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * Sign binarization of a float vector into packed 32-bit words (stored as
 * LONGs): bit = 1 iff the component is > 0, MSB-first within each word
 * (`acc = acc·2 + bit`, so word w covers components [32w, 32w+32) and a
 * short tail packs into the low bits). 32 bits per word — not 64 — keeps
 * every word non-negative and exactly representable in any engine's
 * signed BIGINT, so a SQL oracle can rebuild codes with pure integer
 * arithmetic (the FloatPacker cross-engine discipline). 128x narrower
 * than the float vector — the binary-sketch first pass of a
 * two-stage Hamming ANN (Charikar 2002 sign-random-projection family;
 * here the identity projection of already-trained embeddings).
 */
case class BinarizeSign(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "binarize_sign"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = (n + 31) / 32
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var acc = 0L
      var j = w * 32
      val end = math.min(j + 32, n)
      while (j < end) {
        acc = acc * 2 + (if (x.getFloat(j) > 0f) 1L else 0L)
        j += 1
      }
      out(w) = acc
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |int $words = ($n + 31) / 32;
         |long[] $out = new long[$words];
         |for (int $w = 0; $w < $words; $w++) {
         |  long $acc = 0L;
         |  int $end = java.lang.Math.min($w * 32 + 32, $n);
         |  for (int $j = $w * 32; $j < $end; $j++) {
         |    $acc = $acc * 2L + ($a.getFloat($j) > 0f ? 1L : 0L);
         |  }
         |  $out[$w] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * Hamming distance between two packed-word code arrays ([[BinarizeSign]]
 * output): Σ popcount(aᵢ XOR bᵢ) — one `Long.bitCount` per word (a
 * hardware POPCNT in the JIT), so the approximate scan of a dim-768
 * vector reads 24 longs instead of 768 floats and does 24 xor+popcnt
 * instead of 768 multiply-adds. Plain integer arithmetic — bit-exact
 * everywhere.
 *
 * Mismatched code lengths compare the SHARED PREFIX (min length) — the
 * convention of every distance kernel in this file. Note the
 * consequence for dirty data: a short (malformed) code's distances are
 * understated, which can float it into bounded-shortlist candidate
 * sets; corpora with heterogeneous dims should validate
 * `size(embedding)` upstream (the index path's F3 dimension check does
 * exactly that), as no kernel here will throw for them.
 */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Column-API entry points for the native expressions. */
object vector {
  private def col(e: Expression): Column = SparkShims.column(e)
  private def expr(c: Column): Expression = SparkShims.expression(c)

  def l2_squared(a: Column, b: Column): Column = col(L2SquaredDistance(expr(a), expr(b)))
  def l2_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.sqrt(l2_squared(a, b))
  def vec_dot(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))
  def cosine_sim(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))
  def vec_norm(a: Column): Column = col(VectorNorm(expr(a)))
  def pq_adc_distance(lut: Column, code: Column): Column =
    col(PqAdcDistance(expr(lut), expr(code)))
  def pq_encode(emb: Column, centroids: Column, m: Column): Column =
    col(PqEncode(expr(emb), expr(centroids), expr(m)))
  def argmin_l2(emb: Column, centroids: Column): Column =
    col(ArgminL2(expr(emb), expr(centroids)))
  def int8_quant_stats(a: Column): Column = col(Int8QuantStatsExpr(expr(a)))
  def sign_project(vec: Column, signs: Column): Column =
    col(SignProject(expr(vec), expr(signs)))
  def cosine_sim_i8(codes: Column, q: Column): Column =
    col(CosineSimilarityI8(expr(codes), expr(q)))
  def binarize_sign(vec: Column): Column = col(BinarizeSign(expr(vec)))
  def hamming_dist(a: Column, b: Column): Column =
    col(HammingDistance(expr(a), expr(b)))
}
