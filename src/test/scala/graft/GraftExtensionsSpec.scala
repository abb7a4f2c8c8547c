package graft

/** SQL-registry surface: the extension functions resolve and compute
  * the same values as their Column-API forms. Registered into the
  * shared session (the post-construction path); the
  * withExtensions/spark.sql.extensions path runs the same builders. */
class GraftExtensionsSpec extends SparkTestBase {

  test("extension functions are callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_hash64('x') AS h64,
        |       graft_hash63('x') AS h63,
        |       graft_registry_frame('42', 'hi') AS frame,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
        |""".stripMargin).collect().head
    // md5('x') = 9dd4e461268c8034f5c8564e155c67a6
    assert(row.getAs[Long]("h64") == java.lang.Long.parseLong("9dd4e461", 16))
    assert(row.getAs[Long]("h63") ==
      java.lang.Long.parseLong("9dd4e461", 16) +
        (java.lang.Long.parseLong("268c8034", 16) % 2147483648L) * 4294967296L)
    assert(row.getAs[String]("frame").startsWith("00"))
    assert(row.getAs[String]("frame").endsWith("6869"))
    assert(row.getAs[Double]("dot") == 11.0)

    // Column-API ↔ SQL-registry parity on real data.
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(sf() + "/nation.parquet")
      .select(col("n_name"))
    val viaCol = df.select(graft.functions.Portable.hash64(col("n_name")))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    df.createOrReplaceTempView("ext_nation")
    val viaSql = spark.sql("SELECT graft_hash64(n_name) FROM ext_nation")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    assert(viaCol == viaSql)

    // graft_lsh_bucket: SQL form matches the Column/codegen form and
    // rejects a non-literal nBits.
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    emb.createOrReplaceTempView("ext_emb")
    val bCol = emb.select(graft.functions.VectorFunctions.lshBucket(col("v"), 4))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    val bSql = spark.sql("SELECT graft_lsh_bucket(v, 4) FROM ext_emb")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    assert(bCol == bSql)
    // Any FOLDABLE integral nBits is accepted — folded arithmetic and
    // non-Int integral literals resolve to the same planes as `4`.
    val bFold = spark.sql("SELECT graft_lsh_bucket(v, 2 + 2) FROM ext_emb")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    assert(bFold == bSql)
    val bCast = spark.sql("SELECT graft_lsh_bucket(v, CAST(4 AS BIGINT)) FROM ext_emb")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    assert(bCast == bSql)
    intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(v, vec_id) FROM ext_emb").collect()
    }
    intercept[Exception] { // statically known but out of range
      spark.sql("SELECT graft_lsh_bucket(v, 64) FROM ext_emb").collect()
    }
  }
}
