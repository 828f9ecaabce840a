package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types._

/**
 * Data-layout kernels. Z-ordering (Morton curve) is the standard
 * multi-dimensional clustering trick for 100 TB scan pruning: sort/
 * range-partition the table by the interleaved key and BOTH dimensions
 * become selective at the file level — parquet row-group min/max
 * statistics then skip files for predicates on either column (a plain
 * sort gives that for the leading column only). The write path is
 * `df.repartitionByRange(N, col(z)).sortWithinPartitions(z)` + parquet;
 * this expression supplies the key.
 */

/** Morton interleave of the low 16 bits of two non-negative ints:
  * result bit 2i = x bit i, bit 2i+1 = y bit i — a 32-bit z-value as
  * LONG. Callers reduce dimensions mod 2^16 (or bucket them) first;
  * locality is preserved under any monotone per-dimension bucketing. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Int]
    val y = b.asInstanceOf[Int]
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (long) (($a >> $i) & 1) << (2 * $i);
         |  $z |= (long) (($b >> $i) & 1) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Hilbert-curve index of a 16-bit 2-D point (the classic xy→d walk,
  * public-domain algorithm as on the Hilbert-curve literature): a
  * 32-bit position on the order-16 curve as LONG. Hilbert keeps every
  * curve-contiguous range a CONNECTED 2-D region (Morton has octave
  * jumps), so equal-size buckets of the sort key have tighter per-file
  * min/max boxes — strictly better row-group skipping at the same
  * layout cost. Callers reduce dimensions mod 2^16 first, as with
  * [[ZOrder2]]. */
case class Hilbert2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[SparkShims.AbstractType] =
    SparkShims.abstractTypes(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Int] & 0xffff
    var y = b.asInstanceOf[Int] & 0xffff
    var d = 0L
    var s = 1 << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |int $x = $a & 0xffff; int $y = $b & 0xffff;
         |long $d = 0L;
         |for (int $s = 1 << 15; $s > 0; $s >>= 1) {
         |  int $rx = (($x & $s) > 0) ? 1 : 0;
         |  int $ry = (($y & $s) > 0) ? 1 : 0;
         |  $d += (long) $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    int $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Column-API entry points for the layout kernels. */
object layout {
  def zorder2(x: Column, y: Column): Column =
    SparkShims.column(ZOrder2(SparkShims.expression(x), SparkShims.expression(y)))
  def hilbert2(x: Column, y: Column): Column =
    SparkShims.column(Hilbert2(SparkShims.expression(x), SparkShims.expression(y)))
}
