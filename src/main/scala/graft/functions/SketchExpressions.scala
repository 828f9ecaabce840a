package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH sketch for cosine similarity: `tables` independent
 * sketches of `planesPerTable` sign bits each, packed into one LONG per
 * table.
 *
 * One expression computes all tables' buckets in a single pass over the
 * embedding (unrolling tables×planes separate dot-product expressions
 * multiplies codegen size and compile time; this is the same lesson as
 * the text sketches in TextExpressions.scala).
 *
 * `planes` is row-major [tables*planesPerTable][dim], generated
 * deterministically by the caller.
 */
case class HyperplaneSketch(child: Expression, planes: Array[Float], tables: Int, planesPerTable: Int)
    extends UnaryExpression with CodegenFallback {
  private val dim = planes.length / (tables * planesPerTable)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sketch"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var p = 0
      while (p < planesPerTable) {
        val off = (t * planesPerTable + p) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v.getFloat(i).toDouble * planes(off + i)
          i += 1
        }
        if (acc >= 0) bits |= (1L << p)
        p += 1
      }
      out(t) = bits
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object sketch {
  def hyperplane_sketch(c: Column, planes: Array[Float], tables: Int, planesPerTable: Int): Column =
    SparkShims.column(HyperplaneSketch(SparkShims.expression(c), planes, tables, planesPerTable))
}
