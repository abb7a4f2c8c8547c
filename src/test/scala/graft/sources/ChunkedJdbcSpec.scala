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
}
