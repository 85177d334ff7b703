package graft

/** Driver-contract invariants: every declared query has an oracle twin
  * (the driver downgrades oracle-less queries to a weak rows-only check),
  * no orphan oracles, and the flagship smoke query returns rows.
  */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("flagship entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
