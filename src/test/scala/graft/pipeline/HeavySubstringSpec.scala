package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Exact substring-run dedup at volume: 200k synthetic docs (~300 chars
 * each, ~54M posting-list grams) through [[Dedup.substringRuns]] — the
 * 400×-the-gate-SF evidence that the df-capped posting-list join holds
 * its shape when the data term dominates. Planted structure:
 *
 *  - 500 doc pairs share a unique 60-char passage (df = 2 — must all
 *    be recovered with max_shared_run ≥ 60);
 *  - every third doc carries an identical 90-char boilerplate sentence
 *    (df ≈ 66k ≫ maxDf=50 — the hot-gram guard must drop it BEFORE the
 *    self-join; without the cap this alone would be ~2.2e9 pairs).
 *
 * Wall-clock is printed for BASELINE.md; asserts are structural
 * (planted recall, boilerplate suppression) — no oracle at this size.
 *
 * Gated behind GRAFT_HEAVY:
 * {{{ GRAFT_HEAVY=1 sbt "testOnly graft.pipeline.HeavySubstringSpec" }}}
 */
class HeavySubstringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("200k-doc substringRuns: planted passages recovered, boilerplate capped") {
    assume(sys.env.contains("GRAFT_HEAVY") || sys.props.contains("GRAFT_HEAVY"),
      "heavy gate: set GRAFT_HEAVY=1 to run")
    val s = spark
    import s.implicits._

    val n = 200000L
    val nPairs = 500L
    // ~300 chars of deterministic word-salad per doc: 40 words drawn by
    // xxhash64 from a 4096-word synthetic vocabulary ("w" + hash) — the
    // chance of a COINCIDENTAL 30-char shared run is negligible while
    // short word-level collisions are everywhere (realistic for dedup).
    val words = expr(
      """concat_ws(' ', transform(sequence(1, 40),
        |  i -> concat('w', pmod(xxhash64(id, i), 4096))))""".stripMargin)
    val boiler = "THIS DOCUMENT IS PROVIDED AS-IS WITHOUT WARRANTY OF ANY " +
      "KIND EXPRESS OR IMPLIED BOILERPLATE."
    require(boiler.length >= 90)
    // 60-char passage keyed by the pair index, built by REPEATING the
    // id-bearing unit so EVERY 30-gram inside contains the pair id
    // (a constant pad tail would itself be df-capped across the 1000
    // planted docs and split the run)
    val passage = expr(
      s"""substring(repeat(concat('PLANTED-', pmod(id, $nPairs), '-'), 8),
         |1, 60)""".stripMargin)
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        words,
        when(pmod(col("id"), lit(3L)) === 0L, lit(boiler)).otherwise(lit("")),
        when(col("id") < nPairs * 2, passage).otherwise(lit(""))).as("text"))

    val t0 = System.nanoTime()
    val out = Dedup.substringRuns(docs, "doc_id", "text",
      gramLen = 30, maxDf = 50).persist()
    val found = out.count()
    val planted = out.filter(col("max_shared_run") >= 60)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[heavy-substring] 200k docs gram=30 cap=50: $secs%.1f s, " +
      f"pairs=$found, planted_recovered=${planted.size}")

    // every planted pair (i, i + nPairs), nothing else at >= 60 chars
    val expected = (0L until nPairs).map(i => (i, i + nPairs)).toSet
    assert(planted === expected)
    // The cap-held bound: grams INSIDE the boilerplate (df ~ 66k) must
    // never enter the self-join — uncapped that alone is ~2.2e9 pairs.
    // What legitimately survives are "last word + boilerplate prefix"
    // windows (each carries a doc-distinguishing token, df ≈ 66k/4096
    // ≈ 16 ≤ cap), ~4096 · C(16,2) ≈ 0.5M genuine sub-60 shared runs —
    // the real-corpus short-context-plus-boilerplate phenomenon.
    assert(found <= 2000000L,
      s"pair count $found suggests the df-cap failed to drop boilerplate")
    out.unpersist()
  }
}
