package graft

import org.apache.spark.sql.functions._

import graft.functions.VecMath
import graft.sql.GraftExtensions

/** The SQL extension surface: graft's native expressions registered as
  * plain SQL functions — via `spark.sql.extensions` at session build
  * (the deployment path) and via `GraftExtensions.register` on an
  * existing session (the notebook/harness path). Results must be
  * bit-identical to the DataFrame API calls they alias. */
class SqlExtensionsSpec extends SparkFunSuite {

  test("register() installs vec_dot/vec_cosine, identical to DataFrame API") {
    GraftExtensions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(2.5f, -1.0f, 0.5f), Seq(2.5f, -1.0f, 0.5f)))
      .toDF("id", "a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT id, vec_dot(a, b) AS d, vec_cosine(a, b) AS c FROM vecs ORDER BY id")
      .collect()
    val viaApi = df
      .select(col("id"), VecMath.dot(col("a"), col("b")).as("d"),
        VecMath.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSql(0).getDouble(1) == 32.0)
    assert(math.abs(viaSql(2).getDouble(2) - 1.0) < 1e-12)
  }

  test("minhash_mins / simhash_vote / nfc_normalize via SQL") {
    GraftExtensions.register(spark)
    val sp = spark
    import sp.implicits._
    Seq((1L, Seq(7L, 42L, 9000L)), (2L, Seq(7L, 42L, 9000L)))
      .toDF("id", "hs").createOrReplaceTempView("hs")
    val mh = spark.sql(
      "SELECT id, minhash_mins(hs, 8) AS sig, simhash_vote(hs) AS sh FROM hs")
      .collect()
    // deterministic: identical inputs -> identical signatures
    assert(mh(0).getSeq[Long](1) == mh(1).getSeq[Long](1))
    assert(mh(0).getSeq[Long](1).length == 8)
    assert(mh(0).getLong(2) == mh(1).getLong(2))
    // non-literal n is rejected with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_mins(hs, id + 1) FROM hs").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.contains("minhash_mins"))
    // NFC: e + combining acute composes to precomposed e-acute
    val n = spark.sql("SELECT nfc_normalize('é') AS s").head.getString(0)
    assert(n == "é")
  }

  test("GraftExtensions injects its functions through SparkSessionExtensions") {
    // the exact path `spark.sql.extensions=graft.sql.GraftExtensions`
    // takes at session build: apply the class to a fresh extensions
    // object and materialize its registry (getOrCreate would hand back
    // the suite's shared session, silently skipping injection, so the
    // wiring is asserted on the extensions object itself)
    import org.apache.spark.sql.SparkSessionExtensions
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val names =
      org.apache.spark.sql.graftio.FunctionRegistryBridge.materializedNames(ext)
    for (f <- Seq("vec_dot", "vec_cosine", "minhash_mins", "simhash_vote",
        "nfc_normalize"))
      assert(names.contains(f), f)
  }
}
