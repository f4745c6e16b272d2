package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftio.{FunctionRegistryBridge, TextNorm, VecMath}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's native codegen'd expressions, the idiomatic
  * Spark extension point: start a session with
  * `--conf spark.sql.extensions=graft.sql.GraftExtensions` and the
  * functions below are plain SQL — usable from `spark.sql(...)`,
  * JDBC/Thrift, and any BI tool on top, not just the Scala DataFrame API.
  * For a session built elsewhere, `GraftExtensions.register(spark)`
  * installs the same functions after the fact.
  *
  * Registered functions (all whole-stage-codegen'd; see
  * `org.apache.spark.sql.graftio.VecMath` / `TextNorm`):
  *  - `vec_dot(a, b)`       — fused dot product over array<float|double>
  *  - `vec_cosine(a, b)`    — one-pass cosine similarity
  *  - `minhash_mins(hs, n)` — n-permutation MinHash signature (n literal)
  *  - `simhash_vote(hs)`    — 64-bit SimHash majority vote
  *  - `nfc_normalize(s)`    — Unicode NFC canonical composition
  *  - `char_entropy(s)`     — Shannon entropy of the code-point distribution
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => FuseVecHof)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(args: Seq[Expression]): Unit =
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - fused dot product over two arrays"),
      (args: Seq[Expression]) => {
        arity("vec_dot", 2)(args)
        VecMath.ArrayDotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - one-pass cosine similarity"),
      (args: Seq[Expression]) => {
        arity("vec_cosine", 2)(args)
        VecMath.ArrayCosine(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_mins"),
      info("minhash_mins",
        "minhash_mins(hashes, n) - n-permutation MinHash signature"),
      (args: Seq[Expression]) => {
        arity("minhash_mins", 2)(args)
        args(1) match {
          case Literal(n: Int, IntegerType) =>
            VecMath.MinHashMins(args(0), n)
          case other => throw new IllegalArgumentException(
            s"minhash_mins: n must be an integer literal, got $other")
        }
      }),
    (FunctionIdentifier("simhash_vote"),
      info("simhash_vote",
        "simhash_vote(hashes) - 64-bit SimHash majority vote"),
      (args: Seq[Expression]) => {
        arity("simhash_vote", 1)(args)
        VecMath.SimHashVote(args(0))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => {
        arity("nfc_normalize", 1)(args)
        TextNorm.NfcNormalize(args(0))
      }),
    (FunctionIdentifier("char_entropy"),
      info("char_entropy",
        "char_entropy(s) - Shannon entropy (bits) of the code-point distribution"),
      (args: Seq[Expression]) => {
        arity("char_entropy", 1)(args)
        TextNorm.CharEntropy(args(0))
      }))

  /** Install on an already-built session (idempotent: re-registration
    * replaces the same entries; the optimizer rule is added to
    * `experimental.extraOptimizations` once). */
  def register(spark: SparkSession): Unit = {
    FunctionRegistryBridge.register(spark, descriptions)
    if (!spark.experimental.extraOptimizations.contains(FuseVecHof))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseVecHof
  }
}
