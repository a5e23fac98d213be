package graft.etl

import org.apache.spark.sql.SparkSession

/** Dated run-log sink, the analog of the reference's
  * `log_file + datetime + .log` file handler (`etl.py:695-711`): lines go
  * to stdout immediately and are flushed to `<dir>/<prefix><yyyyMMdd>.log`
  * through Hadoop FS on close (object stores have no append, so the log
  * accumulates in memory — run logs are small by construction).
  */
final class RunLog(spark: SparkSession, dir: String, prefix: String) {
  private val buf = new StringBuilder
  // date + time + a nano-tick uniquifier: runs must never overwrite each
  // other's log (object-store create() replaces; there is no append), and
  // second granularity alone still collides for back-to-back/parallel runs
  private val stamp = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
    .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")) +
    "_" + java.lang.Long.toUnsignedString(System.nanoTime(), 36)
  val path = s"$dir/$prefix$stamp.log"

  def info(msg: String): Unit = {
    val line = s"${java.time.Instant.now()} INFO $msg"
    println(line)
    buf.append(line).append('\n')
  }

  def close(): Unit =
    HadoopIo.writeUtf8(spark, path, buf.toString)
}
