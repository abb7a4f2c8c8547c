package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/**
 * Literal query-text assertions, porting the shape of the reference's
 * TestMysqlChunkedQueryManager (datastream-common/src/test/.../dbreader).
 */
class ChunkedJdbcSpec extends AnyFunSuite {

  test("shard predicate hashes the concatenated key mod P") {
    assert(ChunkedJdbc.shardPredicate(Seq("k1"), 4, 2) ==
      "MOD(CRC32(CONCAT(k1)), 4) = 2")
    assert(ChunkedJdbc.shardPredicate(Seq("k1", "k2"), 8, 0) ==
      "MOD(CRC32(CONCAT(k1, k2)), 8) = 0")
  }

  test("one predicate per shard") {
    val ps = ChunkedJdbc.shardPredicates(Seq("id"), 3)
    assert(ps.length == 3)
    assert(ps.toSet.size == 3)
    assert(ps.forall(_.startsWith("MOD(CRC32(CONCAT(id)), 3) = ")))
  }

  test("first chunk query: shard + order + limit, no seek") {
    val q = ChunkedJdbc.chunkQuery("t", Seq("pk"), 2, 1, 100)
    assert(q == "SELECT * FROM t WHERE MOD(CRC32(CONCAT(pk)), 2) = 1 ORDER BY pk LIMIT 100")
  }

  test("subsequent chunk query seeks strictly past composite key") {
    val q = ChunkedJdbc.chunkQuery("t", Seq("k1", "k2"), 2, 0, 10,
      afterKeys = Some(Seq("5", "7")))
    assert(q == ("SELECT * FROM t WHERE MOD(CRC32(CONCAT(k1, k2)), 2) = 0" +
      " AND ( ( k1 > 5 ) OR ( k1 = 5 AND k2 > 7 ) )" +
      " ORDER BY k1, k2 LIMIT 10"))
  }

  test("numeric shard predicates are ANSI MOD, one per shard") {
    val ps = ChunkedJdbc.numericShardPredicates("id", 4)
    assert(ps.toSeq == (0 until 4).map(s => s"MOD(id, 4) = $s"))
  }
}

/**
 * Real JDBC round-trip (S7/T5 executed, not just query-text parity):
 * embedded Derby ships with Spark, so the full
 * spark.read.jdbc(predicates) path runs — shard predicates evaluated
 * inside the database, one Spark partition per shard, shards disjoint
 * and complete. Mirrors the reference's live-database reader tests
 * (datastream-common/src/test/.../dbreader/TestDatabaseChunkedReader.java).
 */
class ChunkedJdbcDerbySpec extends graft.SparkTestBase {

  test("S7 end-to-end: chunked parallel read against embedded Derby") {
    val url = "jdbc:derby:memory:graft_jdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE items (id INT PRIMARY KEY, name VARCHAR(32), qty INT)")
      val ins = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
      (1 to 97).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"item$i"); ins.setInt(3, i * 3)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = ChunkedJdbc.readNumeric(spark, url, "items", "id", 4, props)

    assert(df.rdd.getNumPartitions == 4) // one concurrent scan per shard
    assert(df.count() == 97)
    // shards are disjoint and complete: every id exactly once
    assert(df.select("id").distinct().count() == 97)
    val total = df.agg(org.apache.spark.sql.functions.sum("qty")).head.getLong(0)
    assert(total == (1 to 97).map(_ * 3L).sum)
  }
}
