package graft.streaming

import graft.SparkSpecBase
import graft.etl.Sinks
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

/** The streaming CDC apply (19th op): staged changeset files merge
  * into the partitioned table batch by batch; a crash-replay of an
  * already-merged batch is a table-level fixpoint; a restart run with
  * nothing new changes nothing; a batch that empties a partition
  * deletes its directory (the r13 mergeInto rule, now exercised
  * through the streaming path).
  */
class MergeStreamSinkSpec extends SparkSpecBase {
  import spark.implicits._

  test("staged changesets merge in order; replay and empty restart are no-ops") {
    val base = Files.createTempDirectory("graft-merge-stream")
    val watch = Files.createDirectory(base.resolve("landing"))
    val out = base.resolve("out").toString
    val chk = base.resolve("chk").toString
    val spec = Sinks.TableSpec("cdc_t", Sinks.Parquet, Seq("src"))

    // seed the target table
    Sinks.write(Seq((1L, "a1", "a"), (2L, "a2", "a"), (3L, "b3", "b"))
      .toDF("id", "v", "src"), spec, out)
    def table() = spark.read.parquet(s"$out/${spec.name}")
      .as[(Long, String, String)].collect().toSet

    def stage(name: String, rows: Seq[(Long, String, String, String)]): Unit = {
      val tmp = Files.createTempDirectory("cdcstage").toString
      rows.toDF("id", "op", "v", "src").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(Paths.get(part.toString), watch.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = MergeStreamSink.run(
      spark.readStream.schema("id LONG, op STRING, v STRING, src STRING")
        .parquet(watch.toString),
      Seq("id"), spec, out, chk)

    // batch 1: update + insert
    stage("c1.parquet", Seq((1L, "U", "a1'", "a"), (4L, "I", "b4", "b")))
    run()
    assert(table() === Set((1L, "a1'", "a"), (2L, "a2", "a"),
      (3L, "b3", "b"), (4L, "b4", "b")))

    // batch 2 via restart: delete BOTH b-rows — the partition empties
    // and its directory must be gone (the r13 stale-file rule through
    // the streaming path)
    stage("c2.parquet", Seq((3L, "D", null.asInstanceOf[String], null.asInstanceOf[String]),
      (4L, "D", null.asInstanceOf[String], null.asInstanceOf[String])))
    run()
    assert(table() === Set((1L, "a1'", "a"), (2L, "a2", "a")))
    assert(!new java.io.File(s"$out/${spec.name}/src=b").exists(),
      "emptied partition survived the streaming merge")

    // crash-replay convergence: re-applying batch 2's changeset
    // directly (as a recovered foreachBatch would) is a fixpoint
    val replay = Seq((3L, "D", null.asInstanceOf[String], null.asInstanceOf[String]),
      (4L, "D", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "op", "v", "src")
    MergeStreamSink.applyBatch(replay, Seq("id"), spec, out)
    assert(table() === Set((1L, "a1'", "a"), (2L, "a2", "a")))

    // restart with nothing staged: checkpoint says all consumed
    run()
    assert(table() === Set((1L, "a1'", "a"), (2L, "a2", "a")))
  }

  test("a CDC feed carrying a NEW column evolves the table only when opted in") {
    val base = Files.createTempDirectory("graft-merge-stream-evolve")
    val watch = Files.createDirectory(base.resolve("landing"))
    val out = base.resolve("out").toString
    val spec = Sinks.TableSpec("cdc_ev_t", Sinks.Parquet, Seq("src"))
    Sinks.write(Seq((1L, "a1", "a"), (2L, "b2", "b"))
      .toDF("id", "v", "src"), spec, out)
    val rows = Seq((1L, "U", "a1x", "a", 7L))
    val tmp = Files.createTempDirectory("cdcevstage").toString
    rows.toDF("id", "op", "v", "src", "score").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(Paths.get(part.toString), watch.resolve("e1.parquet"))
    def src() = spark.readStream
      .schema("id LONG, op STRING, v STRING, src STRING, score LONG")
      .parquet(watch.toString)

    // default: the carrying micro-batch fails LOUDLY (the streaming
    // query surfaces the schema-gate rejection, the table is untouched)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      MergeStreamSink.run(src(), Seq("id"), spec, out,
        base.resolve("chk1").toString)
    }
    assert(e.getCause.getMessage.contains("NEW column"), e.getCause.getMessage)
    assert(spark.read.parquet(s"$out/${spec.name}")
      .as[(Long, String, String)].collect().toSet ===
      Set((1L, "a1", "a"), (2L, "b2", "b")))

    // opted in: the batch ADD-COLUMNs the table; the untouched
    // partition reads back null through the evolved read path
    MergeStreamSink.run(src(), Seq("id"), spec, out,
      base.resolve("chk2").toString, evolveSchema = true)
    assert(Sinks.readTable(spark, spec, out)
      .select("id", "v", "src", "score")
      .as[(Long, String, String, Option[Long])].collect().toSet ===
      Set((1L, "a1x", "a", Some(7L)), (2L, "b2", "b", None)))
  }

  test("an empty batch never touches the target") {
    val out = Files.createTempDirectory("graft-merge-empty-batch").toString
    val spec = Sinks.TableSpec("cdc_e", Sinks.Parquet, Seq("src"))
    Sinks.write(Seq((1L, "a1", "a")).toDF("id", "v", "src"), spec, out)
    val before = new java.io.File(s"$out/${spec.name}/src=a").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).toSeq.sorted
    val n = MergeStreamSink.applyBatch(
      Seq.empty[(Long, String, String, String)].toDF("id", "op", "v", "src"),
      Seq("id"), spec, out)
    assert(n === 0L)
    assert(new java.io.File(s"$out/${spec.name}/src=a").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).toSeq.sorted === before)
  }
}
