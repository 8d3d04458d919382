package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Shared session-registry plumbing for the native expressions (`parse_redo`,
  * `vec_dot`, `envelope_fold`): one definition of the idempotent register-if-absent
  * loop, so a fix (thread-safety, the classic-session cast, a Spark API change) lands
  * once instead of drifting across per-expression copies. Callers pass the session
  * that will ANALYZE the plan (ADVICE r6 — never the thread-local active session). */
private[functions] object Registrations {
  type Entry = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  def ensure(spark: SparkSession, regs: Seq[Entry]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    regs.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    }
  }
}
