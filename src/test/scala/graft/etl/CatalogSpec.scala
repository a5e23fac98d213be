package graft.etl

import graft.SparkSpecBase
import java.nio.file.Files
import scala.sys.process._

/** Cross-session catalog persistence (VERDICT item 5): register the
  * written tables in a Hive/Derby-backed session, then query them BY NAME
  * from a brand-new JVM that shares nothing but the warehouse directory.
  * Two child JVMs (CatalogCheck write / read) make the isolation real —
  * in-process "fresh sessions" share catalog state and would prove
  * nothing.
  */
class CatalogSpec extends SparkSpecBase {

  private def codeDir(c: Class[_]): String =
    new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI).toString

  test("tables registered via the registry resolve by name in a fresh JVM") {
    // stage: write a small pipeline output with the shared session
    val base = Files.createTempDirectory("graft-catalog").toString
    EtlPipeline.runAll(spark, Seq(Fixtures.rawI94(spark)),
      Fixtures.airports(spark), Fixtures.demographics(spark),
      Fixtures.dictionary, s"$base/output")

    val mainClasses = codeDir(classOf[EtlConfig])        // target/.../classes
    val sparkJars = new java.io.File(
      codeDir(classOf[org.apache.spark.sql.SparkSession])).getParent
    val cp = s"$mainClasses:$sparkJars/*"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // the JDK17 module-opens Spark needs, straight from its own launcher
    val opens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").toSeq
    def phase(args: String*): Int =
      Process(Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.etl.CatalogCheck") ++ args).!

    assert(phase("write", s"$base/wh", s"$base/output") === 0, "write phase")
    // fresh JVM, same warehouse root, no re-registration: metadata must
    // come from the Derby metastore alone
    assert(phase("read", s"$base/wh", "i94_trips") === 0, "read phase")
    assert(phase("read", s"$base/wh", "i94_visa") === 0, "read phase csv")
  }
}
