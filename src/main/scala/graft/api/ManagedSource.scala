package graft.api

import org.apache.spark.sql.{Encoder, SparkSession}

/** Reference `ManagedSource` (Node.scala:135-171): a source whose
  * backing resource is opened before reading and closed exactly once on
  * any terminal path, with ADR-0005 precedence (read error primary,
  * close error suppressed; open failure closes nothing and surfaces).
  *
  * This is the driver-side form — the reference's sources are in-process
  * resources (iterators, queues), and their Spark-native analog for
  * *distributed* data is a DataSource connector whose lifecycle Spark
  * manages. Use this for modest driver-local resources (a file handle, a
  * client) whose rows then parallelize into a Dataset.
  */
object ManagedSource {

  def read[R <: AutoCloseable, T: Encoder](
      spark: SparkSession,
      open: () => R)(
      readAll: R => IterableOnce[T]): Flow[T] = {
    val resource = open()
    var primary: Throwable = null
    val rows =
      try readAll(resource).iterator.toSeq
      catch { case e: Throwable => primary = e; Seq.empty[T] }
      finally {
        try resource.close()
        catch {
          case ce: Throwable =>
            if (primary != null) primary.addSuppressed(ce)
            else primary = ce
        }
      }
    if (primary != null) throw primary
    Flow(spark.createDataset(rows), "managedSource")
  }

  /** Typed fold-sink as a Spark `Aggregator` — the UDAF surface for the
    * reference's `Sink(zero, f)` (Node.scala:439): distributed
    * partial+final aggregation, requiring the documented associative
    * `combine` (SURVEY §7.4.5).
    */
  final class FoldAggregator[T, B](
      z: B, f: (B, T) => B, combine: (B, B) => B)(
      implicit bEnc: Encoder[B])
      extends org.apache.spark.sql.expressions.Aggregator[T, B, B] {
    override def zero: B = z
    override def reduce(b: B, a: T): B = f(b, a)
    override def merge(b1: B, b2: B): B = combine(b1, b2)
    override def finish(reduction: B): B = reduction
    override def bufferEncoder: Encoder[B] = bEnc
    override def outputEncoder: Encoder[B] = bEnc
  }
}
