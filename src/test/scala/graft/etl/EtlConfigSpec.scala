package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class EtlConfigSpec extends AnyFunSuite {

  private val sample =
    """# comment line
      |[PATHS]
      |base_dir = /tmp/graft-cfg
      |data_dir = data
      |input_files = ["raw_apr16.parquet", "raw_may16.parquet"]
      |airports_file = airports.csv
      |us_demographics_file = demographics.csv
      |dictionary_file = dict.sas
      |output_dir = out
      |log_file = etl_logging_
      |
      |[DQ]
      |tables = '["i94_visa", "i94_travel_mode"]'
      |table_col = '{"i94_visa": ["visa_id"], "i94_travel_mode": ["mode_id"]}'
      |""".stripMargin

  test("sections, paths, lists, and the DQ map parse like the reference cfg") {
    val cfg = EtlConfig.parse(sample)
    assert(cfg.baseDir === "/tmp/graft-cfg")
    assert(cfg.inputFiles === Seq(
      "/tmp/graft-cfg/data/raw_apr16.parquet",
      "/tmp/graft-cfg/data/raw_may16.parquet"))
    assert(cfg.airportsFile === "/tmp/graft-cfg/data/airports.csv")
    assert(cfg.dictionaryFile === "/tmp/graft-cfg/data/dict.sas")
    assert(cfg.outputDir === "/tmp/graft-cfg/out")
    // defaults for unset dirs
    assert(cfg.logDir === "/tmp/graft-cfg/log")
    assert(cfg.dqSpecs === Seq(
      "i94_visa" -> Seq("visa_id"), "i94_travel_mode" -> Seq("mode_id")))
  }

  test("DQ tables without a column entry fall back to row-count-only") {
    val cfg = EtlConfig.parse(
      "[PATHS]\nbase_dir = /b\n[DQ]\ntables = [\"t1\", \"t2\"]\n" +
        "table_col = '{\"t1\": [\"k\"]}'")
    assert(cfg.dqSpecs === Seq("t1" -> Seq("k"), "t2" -> Nil))
  }

  test("missing keys fail loudly; malformed literals are rejected") {
    val cfg = EtlConfig.parse("[PATHS]\nbase_dir = /b")
    intercept[IllegalArgumentException](cfg.inputFiles)
    intercept[IllegalArgumentException](EtlConfig.parseList("not a list"))
    intercept[IllegalArgumentException](EtlConfig.parseTableMap("nope"))
  }

  test("parseFlags finds flags at any argv position and rejects misuse") {
    // pure positional → None (legacy form)
    assert(EtlMain.parseFlags(Array("out", "a.csv")) === None)
    // flags in either order, including the odd-offset positions the old
    // sliding(2,2) pairing could not see
    assert(EtlMain.parseFlags(Array("--config", "c.cfg")) === Some("LOCAL" -> "c.cfg"))
    assert(EtlMain.parseFlags(Array("--env", "s3", "--config", "c.cfg"))
      === Some("S3" -> "c.cfg"))
    assert(EtlMain.parseFlags(Array("--config", "c.cfg", "--env", "docker"))
      === Some("DOCKER" -> "c.cfg"))
    // mixing positional with flags is an error, not a silent drop
    intercept[IllegalArgumentException](EtlMain.parseFlags(Array("out", "--config", "c.cfg")))
    // unknown flags, missing values, duplicates, bad env: loud
    intercept[IllegalArgumentException](EtlMain.parseFlags(Array("--cfg", "c.cfg")))
    intercept[IllegalArgumentException](EtlMain.parseFlags(Array("--config")))
    intercept[IllegalArgumentException](
      EtlMain.parseFlags(Array("--config", "a", "--config", "b")))
    intercept[IllegalArgumentException](EtlMain.parseFlags(Array("--env", "PROD", "--config", "c")))
    intercept[IllegalArgumentException](EtlMain.parseFlags(Array("--env", "LOCAL")))
  }
}
