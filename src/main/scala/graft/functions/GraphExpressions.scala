package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Graph-analytics kernels. */

/** Intersection of two SORTED ARRAY<BIGINT>s by a single merge walk —
  * the triangle-close kernel. `array_intersect` builds a hash set per
  * row; on the oriented co-purchase graph that is |E| set builds of
  * ~out-degree entries each, and the allocation dominates the close
  * step. The merge walk is O(|a|+|b|) over primitive longs with no
  * per-row allocation beyond the (usually tiny) result.
  *
  * Caller contract: both inputs ascending-sorted (GraphAlgos sorts the
  * adjacency lists once at build). Duplicate input elements are
  * tolerated — the walk emits each matched value once, preserving
  * array_intersect's set semantics (a non-distinct edge set must not
  * silently inflate triangle counts). */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Long](math.min(xs.length, ys.length))
    var i = 0; var j = 0; var n = 0
    while (i < xs.length && j < ys.length) {
      val x = xs(i); val y = ys(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        if (n == 0 || out(n - 1) != x) { out(n) = x; n += 1 }
        i += 1; j += 1
      }
    }
    // primitive-backed result — GenericArrayData would box every long
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Column-API entry points. */
object graph {
  def sorted_intersect(a: Column, b: Column): Column =
    SparkShims.column(SortedIntersectExpr(
      SparkShims.expression(a), SparkShims.expression(b)))
}
