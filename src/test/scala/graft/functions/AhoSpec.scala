package graft.functions

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form semantics of [[AhoAutomaton]] / aho_counts: one automaton
  * pass counts every dictionary pattern at every match END position
  * (overlapping included), each pattern independently. */
class AhoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def counts(t: String, pats: Seq[String]): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(t).toDF("t")
      .select(text.aho_counts(col("t"), pats).as("c"))
      .head().getSeq[Long](0)
  }

  test("all occurrences counted, overlapping included") {
    // "aa" in "aaaa": end positions 1,2,3 -> 3 (a replace-based counter
    // would say 2 — this pins the true automaton semantics)
    assert(counts("aaaa", Seq("aa")) === Seq(3L))
  }

  test("dictionary-substring pairs count independently") {
    // "data" occurs inside "database" — both fire on the same span
    assert(counts("database data", Seq("data", "database", "base")) ===
      Seq(2L, 1L, 1L))
  }

  test("fail transitions recover partial matches (the aho vs naive-trie case)") {
    // scanning "ababc" for {"ababd","abc"}: the trie walk down ababd
    // dies at 'c'; the fail link must land in "ab"+"c" and report "abc"
    assert(counts("ababc", Seq("ababd", "abc")) === Seq(0L, 1L))
    // suffix-of-prefix reporting via output closure: "aba" end inside
    // the longer walk toward "ababab"
    assert(counts("ababab", Seq("ababab", "aba")) === Seq(1L, 2L))
  }

  test("phrases match across token boundaries; misses are zero") {
    assert(counts("big query scan slow scan", Seq("big query", "scan slow", "slow scan", "xyz")) ===
      Seq(1L, 1L, 1L, 0L))
  }

  test("unicode text walks per UTF-16 char") {
    assert(counts("héllo wörld héllo", Seq("héllo", "wörld", "llo w")) ===
      Seq(2L, 1L, 1L))
  }

  test("empty text and NULL text") {
    val s = spark
    import s.implicits._
    assert(counts("", Seq("a")) === Seq(0L))
    val r = Seq(Option.empty[String]).toDF("t")
      .select(text.aho_counts(col("t"), Seq("a")).as("c")).head()
    assert(r.isNullAt(0))
  }

  test("guards: empty dictionary / empty pattern / non-foldable dictionary fail") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", Seq("x"))).toDF("t", "p")
    intercept[Exception] {
      df.select(text.aho_counts(col("t"), Seq.empty[String])).collect()
    }
    intercept[Exception] {
      df.select(text.aho_counts(col("t"), Seq("a", ""))).collect()
    }
    // a per-row (non-foldable) dictionary column must be rejected
    import org.apache.spark.sql.graft.SparkShims
    intercept[Exception] {
      val probe = df.select(col("t"), col("p"))
      probe.select(SparkShims.column(AhoCountsExpr(
        SparkShims.expression(col("t")), SparkShims.expression(col("p"))))).collect()
    }
  }

  test("long-text scan is linear-shaped: counts on a 100k-char text") {
    val t = ("ab" * 50000) + "abc"
    assert(counts(t, Seq("abc", "ab")) === Seq(1L, 50001L))
  }
}
