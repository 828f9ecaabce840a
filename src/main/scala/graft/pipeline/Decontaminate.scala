package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/**
 * Benchmark decontamination: find training documents whose word-n-gram
 * overlap with any held-out evaluation document exceeds a threshold — the
 * standard pre-training hygiene step (verbatim eval text inside a train
 * corpus inflates benchmark scores), run at corpus × benchmark scale.
 *
 * Scale design: both sides reduce to (id, shingleHash) via the one-pass
 * native shingle expression (tokenize once per row,
 * graft.functions.ShingleHashesExpr), and the match is an equi-join on
 * the 64-bit shingle hash — shuffle linear in total shingle count, never
 * a doc × bench cross join. The benchmark side is tiny in practice
 * (thousands of eval docs vs billions of train docs), so Catalyst
 * broadcasts it; overlap counting is a partial-aggregating groupBy on
 * (doc, bench) pairs that only exist where at least one shingle collides.
 *
 * Skew: ubiquitous n-grams ("of the and …") pair every train doc with
 * every bench doc that shares them. `maxBenchShingleDf` drops shingles
 * that occur in more than that many BENCHMARK docs before joining —
 * they carry no contamination signal (any specific eval question is
 * identified by its rare n-grams) and bound the join fan-out to
 * |corpus shingles| × maxDf. Off by default to keep the exact
 * (oracle-checkable) semantics.
 */
object Decontaminate {

  /**
   * @param corpus     training documents (corpusId, corpusText)
   * @param bench      held-out evaluation documents (benchId, benchText)
   * @param shingleK   word-n-gram width (default 3, as the dedup paths)
   * @param minOverlap emit pairs with |∩| / |bench shingles| ≥ this
   * @param maxBenchShingleDf drop shingles present in more than this many
   *                   bench docs (0 = keep all, exact semantics)
   * @return (doc_id, bench_id, overlap) — overlap in [0,1], full double
   *         precision (integer-ratio division is engine-exact)
   */
  def ngramOverlap(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      bench: DataFrame,
      benchId: String,
      benchText: String,
      shingleK: Int = 3,
      minOverlap: Double = 0.5,
      maxBenchShingleDf: Int = 0): DataFrame = {
    val corpusSh = corpus.select(col(corpusId).as("doc_id"),
      explode(text.shingle_hashes(col(corpusText), shingleK)).as("sh"))
    val benchShAll = bench.select(col(benchId).as("bench_id"),
      explode(text.shingle_hashes(col(benchText), shingleK)).as("sh"))
    val benchSh =
      if (maxBenchShingleDf <= 0) benchShAll
      else {
        val rare = benchShAll.groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxBenchShingleDf)
          .select("sh")
        benchShAll.join(rare, "sh")
      }
    // denominator = the bench doc's FULL distinct-shingle count (not the
    // df-filtered one): a df-capped run can only under-report overlap,
    // never invent contamination
    val benchSizes = benchShAll.groupBy("bench_id")
      .agg(count(lit(1)).as("n_bench"))
    corpusSh.join(benchSh, "sh")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("c"))
      .join(benchSizes, "bench_id")
      .withColumn("overlap", col("c").cast("double") / col("n_bench"))
      .filter(col("overlap") >= minOverlap)
      .select("doc_id", "bench_id", "overlap")
  }
}
