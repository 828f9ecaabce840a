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

  /** The enforceable half of the reference's JaCoCo coverage gate
    * (build.gradle:216-232): line/branch instrumentation is impossible
    * offline (adjudicated in BASELINE.md round 5 — no scoverage/JaCoCo
    * artifact in the pre-warmed cache), so `sbt test` enforces the proxy
    * instead: the value-oracle surface can only grow. Bump the floor
    * when gates are added; a PR that drops gates must lower it
    * EXPLICITLY here, never silently. */
  test("oracle-gate floor: the correctness surface never shrinks") {
    assert(SparkEntry.queries.size >= 349,
      s"gate registry shrank to ${SparkEntry.queries.size} (floor 349)")
  }

  test("query names are unique across modules (no silent map overwrite)") {
    import graft.operators._
    val all = Seq(RelationalQueries.queries.keys, VectorQueries.queries.keys,
      PipelineQueries.queries.keys).flatten.toSeq
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }
}
