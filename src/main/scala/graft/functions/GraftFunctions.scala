package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.{call_function, lit}

/** Registration + Column-level API for the custom expressions.
  *
  * Two ways in, ONE builder table, same expressions:
  *  - `GraftFunctions.register(spark)` — idempotent runtime registration in
  *    the session's FunctionRegistry (used by the library's own builders).
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — the standard
  *    SparkSessionExtensions injection point for clusters that configure
  *    the engine at session build time; also exposes the functions to pure
  *    SQL (`SELECT graft_dot(a, b)`).
  */
object GraftFunctions {

  private def constInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue

  /** (name, implementing class, builder) — the single registry. */
  private[functions] val builders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct].getName,
      c => DotProduct(c(0), c(1))),
    ("graft_cosine", classOf[CosineSimilarity].getName,
      c => CosineSimilarity(c(0), c(1))),
    ("graft_shingles", classOf[TokenShingles].getName,
      c => TokenShingles(c(0), constInt(c(1)))),
    ("graft_minhash", classOf[MinHashSignature].getName,
      c => MinHashSignature(c(0), constInt(c(1)))),
    ("graft_simhash", classOf[SimHash64].getName,
      c => SimHash64(c(0))),
    ("graft_rolling_fp", classOf[RollingFingerprints].getName,
      c => RollingFingerprints(c(0), constInt(c(1)), constInt(c(2)))))

  /** Idempotent per-session registration — skips names already present so
    * repeated calls (every DataFrame-level builder registers defensively)
    * don't log a "replaced a previously registered function" warning per
    * query.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, b) =>
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Codegen'd dot product of two array<double> columns (requires a
    * registered session — the library's DataFrame-level builders call
    * `register` themselves).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Codegen'd one-pass cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Distinct whitespace-token n-gram shingles of a string column. */
  def shingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** MinHash signature (k minima) of an array<string> shingle set. */
  def minhash(shingleSet: Column, k: Int): Column =
    call_function("graft_minhash", shingleSet, lit(k))

  /** 64-bit SimHash of a string column (whitespace tokens vote per bit). */
  def simhash(text: Column): Column = call_function("graft_simhash", text)

  /** Winnowed Rabin–Karp rolling fingerprints of a string column. */
  def rollingFingerprints(text: Column, k: Int, w: Int): Column =
    call_function("graft_rolling_fp", text, lit(k), lit(w))
}

/** `spark.sql.extensions` entry point — injects the same builder table. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, clazz, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz, name), b))
    }
}
