package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.text.RollingHash

/**
 * Session extension entry point (the `SparkSessionExtensions` registration
 * path of SURVEY §7.3's custom-vs-builtin table): injects the engine's
 * custom Catalyst expressions into the SQL function registry so
 * `spark.sql("SELECT rolling_hash(text) ...")` works, in addition to the
 * typed Column API.
 *
 * Usage: SparkSession.builder().withExtensions(new GraftExtensions) ... or
 * spark.sql.extensions=graft.plans.GraftExtensions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_hash takes exactly one argument")
        RollingHash(children.head)
      }))
  }
}
