package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Contract sanity over sf0.001: every gated query runs and every
  * oracle key points at a real query. */
class QueriesSpec extends SparkTestBase {

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries execute on sf0.001 and return rows") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf()).count()
        if (n == 0) Some(name) else None
    }
    // q08 may legitimately be empty at tiny scale; nothing else should.
    assert(empties.forall(_ == "q08_assignment_diff"), s"empty results: $empties")
  }
}
