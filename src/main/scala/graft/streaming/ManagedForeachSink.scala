package graft.streaming

import org.apache.spark.sql.ForeachWriter

/** Managed streaming sink — reference `ManagedSink` (Node.scala:370-437)
  * on Spark's `ForeachWriter`, whose open/process/close contract is
  * nearly identical (SURVEY §2.3). ADR-0005 precedence is preserved:
  * the resource is closed exactly once per partition-epoch; a processing
  * error stays primary with the close error suppressed (Spark hands it
  * to `close` as `errorOrNull`); a close-only error surfaces.
  */
final class ManagedForeachSink[T, R <: AutoCloseable](
    openFn: () => R,
    processFn: (R, T) => Unit) extends ForeachWriter[T] {

  @transient private var resource: R = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    resource = openFn()
    true
  }

  override def process(value: T): Unit = processFn(resource, value)

  override def close(errorOrNull: Throwable): Unit =
    if (resource != null) {
      val r = resource
      resource = null.asInstanceOf[R]
      try r.close()
      catch {
        case ce: Throwable =>
          if (errorOrNull != null) { errorOrNull.addSuppressed(ce) }
          else throw new graft.api.ResourceCloseException(ce)
      }
    }
}
