package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file IO through Hadoop FS: one FS abstraction for every input,
  * so dictionary/config paths accept the same URI forms (file://, hdfs://,
  * object stores) as the data paths — the reference reads its dictionary
  * with whatever client matches the env (`etl.py:656-668`); here the
  * FileSystem resolved from the path does that dispatch.
  */
object HadoopIo {

  def readUtf8(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeUtf8(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Run `body` against a fresh staging directory and delete the
    * directory EVEN WHEN the body throws (ADVICE r15: the write-gated
    * queries q323/q351/q355 deleted their staging copy only on the
    * success path, leaking a full table copy under /tmp per failed
    * run). The body must eagerly materialize anything it returns
    * (localCheckpoint/collect) — the files are gone on return.
    */
  def withStagingDir[A](spark: SparkSession, prefix: String)(body: String => A): A = {
    val out = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(out)
    finally {
      val root = new Path(out)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    }
  }
}
