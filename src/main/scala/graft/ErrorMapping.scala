package graft

import org.apache.spark.sql.AnalysisException

/** Engine-error → wire-status classification — the reimplementation of
  * the reference's error mapper (swanlake-core/src/service/mod.rs:153-325
  * maps engine failures onto gRPC/Flight status codes so ADBC clients
  * can branch on them). The same classes, derived from Spark's exception
  * taxonomy; the Flight layer turns these into `tonic::Status`
  * equivalents 1:1.
  */
object ErrorMapping {

  sealed trait Status { def code: Int }
  case object InvalidArgument    extends Status { val code = 3 }  // bad SQL / bad params
  case object NotFound           extends Status { val code = 5 }  // missing table/column/handle
  case object AlreadyExists      extends Status { val code = 6 }  // duplicate key / object exists
  case object FailedPrecondition extends Status { val code = 9 }  // txn aborted / constraint
  case object ResourceExhausted  extends Status { val code = 8 }  // session cap
  case object Internal           extends Status { val code = 13 }

  /** Classify a throwable like service/mod.rs:153-325 does: message and
    * error-class sniffing over the engine's exception taxonomy.
    */
  def classify(t: Throwable): Status = t match {
    case _: NoSuchElementException => NotFound // unknown prepared handle (prepared.rs)
    case e: IllegalStateException if msg(e).contains("session limit") => ResourceExhausted
    case e if isDuplicateKey(e) => AlreadyExists
    case e: AnalysisException =>
      val cond = Option(e.getCondition).getOrElse("")
      if (cond.contains("NOT_FOUND") || cond.startsWith("UNRESOLVED") ||
          msg(e).matches("(?s).*(not found|cannot be found|cannot resolve).*")) NotFound
      else if (cond.contains("ALREADY_EXISTS")) AlreadyExists
      else InvalidArgument
    case _: org.apache.spark.sql.catalyst.parser.ParseException => InvalidArgument
    case e: IllegalArgumentException if msg(e).contains("parameter") => InvalidArgument
    case e if msg(e).contains("transaction is aborted") => FailedPrecondition
    // write-write conflict at COMMIT (MutableCatalog.TransactionConflictException):
    // the reference surfaces DuckDB's transaction conflict the same way
    case e if msg(e).contains("transaction conflict") => FailedPrecondition
    case _ => Internal
  }

  private def isDuplicateKey(t: Throwable): Boolean =
    msg(t).toLowerCase.contains("duplicate key")

  private def msg(t: Throwable): String = Option(t.getMessage).getOrElse("")
}
