package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the correctness gate's structural invariants. */
class RegistrySpec extends AnyFunSuite {

  /** Queries DECLARED rows-only: not SQL-expressible, so the driver
    * records the weaker rows>0 check. EMPTY since round 8 — even the
    * iterative BPE trainer has a DuckDB oracle now (unrolled-round
    * argmax re-derivation); keep any future addition justified, the
    * default is a DuckDB value oracle. */
  private val declaredRowsOnly = Set.empty[String]

  test("every registered query carries a DuckDB oracle (0 no_oracle, both ways)") {
    val q = SparkEntry.queries.keySet -- declaredRowsOnly
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across modules (no silent map overwrite)") {
    import graft.operators._
    val all = Seq(RelationalQueries.queries.keys, VectorQueries.queries.keys,
      PipelineQueries.queries.keys).flatten.toSeq
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }
}
