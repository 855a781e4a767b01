package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Config loading/validation (reference: src/PipelineConfig.jl). */
class PipelineConfigSpec extends AnyFunSuite {

  test("empty TOML falls back to the reference loader's literal defaults") {
    val c = PipelineConfig.fromToml("")
    assert(c.signal.agcAlpha == 0.0625f)       // not the struct default 0.125
    assert(c.signal.minPrice == 39000 && c.signal.maxPrice == 44000)
    assert(c.signal.encoderType == "cpm")      // not the struct default "amc"
    assert(c.pipelineName == "loaded")
    assert(c.tickFilePath == "data/raw/YM 06-25.Last.txt")
    assert(!c.bars.enabled && c.bars.barMethod == "boxcar")
  }

  test("parses sections, comments, quotes") {
    val c = PipelineConfig.fromToml(
      """pipeline_name = "p1"  # trailing comment
        |tick_file_path = "dir/with#hash.txt"
        |[signal_processing]
        |encoder_type = "derivative"
        |min_price = 36600
        |# full-line comment
        |[bar_processing]
        |enabled = true
        |ticks_per_bar = 21
        |""".stripMargin)
    assert(c.pipelineName == "p1")
    assert(c.tickFilePath == "dir/with#hash.txt") // '#' inside quotes kept
    assert(c.signal.encoderType == "derivative")
    assert(c.signal.minPrice == 36600)
    assert(c.bars.enabled && c.bars.ticksPerBar == 21)
  }

  test("malformed values report the offending key") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.fromToml("[signal_processing]\nmin_price = banana\n")
    }
    assert(e.getMessage.contains("signal_processing.min_price"))
    assert(e.getMessage.contains("banana"))
  }

  test("validation catches the reference's rules") {
    assert(SignalConfig().validate().isEmpty)
    assert(SignalConfig(agcAlpha = 1.5f).validate().nonEmpty)
    assert(SignalConfig(maxPrice = 1, minPrice = 2).validate().nonEmpty)
    assert(SignalConfig(encoderType = "nope").validate().nonEmpty)
    assert(BarConfig(ticksPerBar = 0).validate().nonEmpty)
    assert(BarConfig(barMethod = "IIR").validate().nonEmpty)
    assert(PipelineConfig(performance =
      PerformanceConfig(targetLatencyUs = 10, maxLatencyUs = 5)).validate().nonEmpty)
  }

  test("shipped config mirrors default.toml") {
    val c = PipelineConfig.shipped
    assert(c.signal.encoderType == "derivative")
    assert(c.signal.tickDerivativeImagScale == 2.0f)
    assert(c.bars.enabled && c.bars.ticksPerBar == 21 && c.bars.barMethod == "FIR")
  }

  test("T6 save half: toToml round-trips through fromToml") {
    val cfgs = Seq(
      PipelineConfig(),
      PipelineConfig.shipped,
      PipelineConfig(pipelineName = "x", tickFilePath = "/tmp/a#b.txt",
        signal = SignalConfig(encoderType = "cpm", agcAlpha = 0.0625f),
        bars = BarConfig(enabled = true, barMethod = "FIR"),
        flow = FlowControlConfig(delayMs = 2.5)),
      // Backslashes and embedded quotes must survive serialization
      // (Windows-style paths, quoted names).
      PipelineConfig(pipelineName = "say \"hi\"",
        tickFilePath = "C:\\Users\\Keith\\data\\YM 06-25.Last.txt"),
      PipelineConfig(pipelineName = "trailing backslash\\",
        tickFilePath = "\\\\server\\share\\q\"uote"),
      // An escaped quote FOLLOWED by '#' inside the value: stripComment
      // must not treat the \" as a quote toggle and truncate the rest of
      // the value as a comment.
      PipelineConfig(pipelineName = "say \"#hi\" loudly",
        tickFilePath = "a\"#\"b#c.txt"))
    cfgs.foreach { c =>
      assert(PipelineConfig.fromToml(PipelineConfig.toToml(c)) == c)
    }
  }

  test("T6 default-config discovery: cwd priority, create-if-missing, load") {
    val cwd = java.nio.file.Files.createTempDirectory("cfgcwd").toString
    val home = java.nio.file.Files.createTempDirectory("cfghome").toString
    // no local config -> home path; loadDefault creates it with
    // constructor defaults and round-trips
    val p0 = PipelineConfig.defaultConfigPath(cwd, home)
    assert(p0.startsWith(home))
    assert(PipelineConfig.loadDefault(cwd, home) == PipelineConfig())
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(p0)))
    // a cwd-local config takes priority once present
    val localPath = java.nio.file.Paths.get(cwd, "config", "pipeline", "default.toml")
    PipelineConfig.save(PipelineConfig(pipelineName = "local"), localPath.toString)
    assert(PipelineConfig.defaultConfigPath(cwd, home) ==
      localPath.toAbsolutePath.toString)
    assert(PipelineConfig.loadDefault(cwd, home).pipelineName == "local")
    // ensureConfigExists never overwrites an existing file
    PipelineConfig.ensureConfigExists(localPath.toString)
    assert(PipelineConfig.loadDefault(cwd, home).pipelineName == "local")
  }

  test("save writes a loadable file") {
    val f = java.nio.file.Files.createTempDirectory("cfg").resolve("sub/p.toml")
    PipelineConfig.save(PipelineConfig.shipped, f.toString)
    val loaded = PipelineConfig.fromToml(java.nio.file.Files.readString(f))
    assert(loaded == PipelineConfig.shipped)
  }
}
