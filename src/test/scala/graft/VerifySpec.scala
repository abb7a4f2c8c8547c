package graft

import java.nio.file.{Files, Paths}

/**
 * Guards for the two dev-filter failure modes in Verify:
 *  - a typo'd or empty SPARK_GRAFT_ONLY must fail loudly, never run a
 *    silent empty dump that reads as green;
 *  - a filtered run must never overwrite the driver's oracle_sql.json
 *    with a subset — it writes oracle_sql.partial.json instead.
 */
class VerifySpec extends SparkTestBase {

  test("parseOnly rejects an empty filter") {
    val e = intercept[IllegalArgumentException](Verify.parseOnly(Some("  , ,")))
    assert(e.getMessage.contains("names no queries"))
  }

  test("parseOnly rejects unknown query names") {
    val e = intercept[IllegalArgumentException](
      Verify.parseOnly(Some("q05_topk,no_such_query")))
    assert(e.getMessage.contains("no_such_query"))
  }

  test("parseOnly accepts valid names and absence") {
    assert(Verify.parseOnly(Some("q05_topk, q06_paging")) ==
      Some(Set("q05_topk", "q06_paging")))
    assert(Verify.parseOnly(None).isEmpty)
  }

  test("filtered runs write oracle_sql.partial.json, not the driver artifact") {
    assert(Verify.oracleFileName(None) == "oracle_sql.json")
    assert(Verify.oracleFileName(Some(Set("q05_topk"))) == "oracle_sql.partial.json")
    val out = Files.createTempDirectory("graft_verify_spec").toString
    Verify.run(spark, sf("0.001"), out, Some(Set("q05_topk")))
    assert(Files.exists(Paths.get(s"$out/q05_topk")), "selected query must dump")
    assert(Files.exists(Paths.get(s"$out/oracle_sql.partial.json")))
    assert(!Files.exists(Paths.get(s"$out/oracle_sql.json")),
      "a filtered run must never produce the full-run artifact name")
    val json = Files.readString(Paths.get(s"$out/oracle_sql.partial.json"))
    assert(json.contains("q05_topk") && !json.contains("q06_paging"))
  }
}
