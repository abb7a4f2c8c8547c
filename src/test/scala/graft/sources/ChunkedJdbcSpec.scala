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

  test("T5 typed bootstrap projection maps Derby column types the reference way") {
    import org.apache.spark.sql.types._
    val url = "jdbc:derby:memory:graft_jdbc_typed;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE snap (id BIGINT PRIMARY KEY, amount DECIMAL(10,3),
          |created TIMESTAMP, born DATE, payload BLOB, note CLOB,
          |ratio DOUBLE)""".stripMargin.replace("\n", " "))
      val ins = conn.prepareStatement("INSERT INTO snap VALUES (?, ?, ?, ?, ?, ?, ?)")
      ins.setLong(1, 7L)
      ins.setBigDecimal(2, new java.math.BigDecimal("12345.678"))
      ins.setTimestamp(3, java.sql.Timestamp.valueOf("2024-03-01 12:30:45.5"))
      ins.setDate(4, java.sql.Date.valueOf("2024-03-01"))
      ins.setBytes(5, Array[Byte](1, 2, 3))
      ins.setString(6, "hello")
      ins.setDouble(7, 0.25)
      ins.executeUpdate()
    } finally conn.close()

    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val typed = ChunkedJdbc.bootstrapProjection(
      ChunkedJdbc.readNumeric(spark, url, "snap", "id", 2, props))

    // NUMBER → string carrying precision/scale metadata; TIMESTAMP and
    // DATE → epoch-ms long; BLOB → bytes; CLOB → string; LONG/DOUBLE
    // keep native width (Types.java:13-33).
    val f = typed.schema.fields.map(x => x.name.toLowerCase -> x).toMap
    assert(f("amount").dataType == StringType)
    assert(f("amount").metadata.getLong("precision") == 10L &&
      f("amount").metadata.getLong("scale") == 3L)
    assert(f("created").dataType == LongType)
    assert(f("born").dataType == LongType)
    assert(f("payload").dataType == BinaryType)
    assert(f("note").dataType == StringType)
    assert(f("id").dataType == LongType)
    assert(f("ratio").dataType == DoubleType)

    val row = typed.collect().head
    val get = typed.columns.map(_.toLowerCase).zipWithIndex.toMap
    assert(row.getString(get("amount")) == "12345.678")
    assert(row.getLong(get("created")) ==
      java.sql.Timestamp.valueOf("2024-03-01 12:30:45.5").getTime)
    assert(row.getLong(get("born")) ==
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime)
    assert(row.getAs[Array[Byte]](get("payload")).toSeq == Seq[Byte](1, 2, 3))
    assert(row.getString(get("note")) == "hello")
  }
}
