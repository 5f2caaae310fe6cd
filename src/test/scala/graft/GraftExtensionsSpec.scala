package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface parity for the custom Catalyst expressions: both registration
  * paths (build-time SparkSessionExtensions, runtime registry) expose every
  * graft function to `spark.sql`.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("runtime registration exposes every custom function to SQL") {
    GraftSqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  size(word_shingles('a b c d', 3))                 AS n_sh,
        |  size(minhash_signature(word_shingles('a b c', 1), 16)) AS n_sig,
        |  simhash64(array('x', 'y'))                        AS sh,
        |  vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))  AS dp,
        |  vector_norm(array(3.0D, 4.0D))                    AS nrm,
        |  hyperplane_sig(array(1.0D, -2.0D), 4)             AS sig,
        |  json_drop_keys('{"a":1,"b":2,"c":3}', 'a', 'c')   AS dropped
        |""".stripMargin).head()
    assert(r.getAs[Int]("n_sh") == 2) // "a b c", "b c d"
    assert(r.getAs[Int]("n_sig") == 16)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Double]("nrm") == 5.0)
    assert(r.getAs[String]("dropped") == """{"b":2}""")
  }

  test("SQL and Column APIs produce identical results on real data") {
    GraftSqlFunctions.register(spark)
    Tables(spark, sf(), "documents").createOrReplaceTempView("docs_ext_v")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_signature(word_shingles(text, 3), 16) AS sig " +
        "FROM docs_ext_v ORDER BY doc_id LIMIT 20").collect()
    val viaCols = Tables(spark, sf(), "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        operators.Dedup.minhashSignature(
          org.apache.spark.sql.functions.col("text"), 16, 3).as("sig"))
      .orderBy("doc_id").limit(20).collect()
    assert(viaSql.map(_.toString).toSeq == viaCols.map(_.toString).toSeq)
  }

  test("kernel and sketch functions are SQL-callable") {
    graft.GraftSqlFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS i, " +
        "positional_agree_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS p")
      .head()
    assert(r.getAs[Int]("i") == 2 && r.getAs[Int]("p") == 2)
    val topk = spark.sql(
      "SELECT top_k_pairs(struct(CAST(v AS DOUBLE), id), 2) AS t FROM " +
        "VALUES (1L, 0.5), (2L, 0.9), (3L, 0.7) AS x(id, v)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((2L, 0.9), (3L, 0.7)))
  }

  test("bloom_agg / bloom_might_contain: SQL set-membership with no false negatives") {
    GraftSqlFunctions.register(spark)
    // the filter arg must be a constant or scalar subquery (Spark's
    // might_contain contract) — the scalar-subquery form is the SQL idiom
    val bf = "(SELECT bloom_agg(xxhash64(w), 100L, 4096L) " +
      "FROM VALUES ('alpha'), ('beta'), ('gamma') AS t(w))"
    val row = spark.sql(
      s"SELECT bloom_might_contain($bf, xxhash64('beta')) AS hit, " +
        s"bloom_might_contain($bf, xxhash64('zzz_not_inserted_1')) AS miss1, " +
        s"bloom_might_contain($bf, xxhash64('zzz_not_inserted_2')) AS miss2").head()
    assert(row.getAs[Boolean]("hit")) // inserted -> must hit, always
    // 4096 bits for 3 items: FP odds are negligible for this fixed probe
    assert(!row.getAs[Boolean]("miss1") && !row.getAs[Boolean]("miss2"))
  }

  test("build-time withExtensions registers functions at session creation") {
    val prev = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same JVM/SparkContext, fresh session state with the extensions wired
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val n = s2.sql("SELECT size(word_shingles('w x y z', 2)) AS n")
        .head().getAs[Int]("n")
      assert(n == 3) // "w x", "x y", "y z"
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
