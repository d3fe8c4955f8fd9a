package graft
package api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{AdapterRegistry, MemoryAdapter, StoreAdapter, StoreConfig}

/** Custom adapter factory loadable by class name (reference
  * config-operations.ts:150-200 dynamic import analogue). */
class TestAdapterFactory extends (StoreConfig => StoreAdapter) {
  override def apply(cfg: StoreConfig): StoreAdapter = new MemoryAdapter
}

class GraftConfigSpec extends AnyFunSuite {

  test("defaults match the reference's getDefaultGistdexConfig values") {
    val c = new GraftConfig(GraftConfig.Defaults)
    assert(c.dimension === 768)
    assert(c.chunkSize === 1000 && c.chunkOverlap === 200)
    assert(c.batchSize === 100 && c.preserveBoundaries)
    assert(c.defaultK === 10 && c.enableRerank)
    assert(c.rerankBoostFactor === 1.5)
    assert(c.hybridKeywordWeight === 0.3)
    assert(c.ciThreshold === 0.7)
    assert(c.provider === "parquet") // engine's canonical store
  }

  test("discovery chain: first parseable file wins, bad JSON skipped, partial merge") {
    val cwd = Files.createTempDirectory("graft_cfg")
    val home = Files.createTempDirectory("graft_home")
    // unparseable first candidate must be skipped (reference
    // try/continue), falling through to the home-dir config
    Files.writeString(cwd.resolve("graft.config.json"), "{not json")
    Files.createDirectories(home.resolve(".graft"))
    Files.writeString(home.resolve(".graft").resolve("config.json"),
      """{"search": {"defaultK": 3}, "vectorDB": {"provider": "memory"}}""")
    val c = GraftConfig.load(cwd, home)
    assert(c.defaultK === 3)            // overridden
    assert(c.provider === "memory")     // overridden
    assert(c.chunkSize === 1000)        // default survives the merge
    assert(c.hybridKeywordWeight === 0.3)

    // a valid cwd config takes priority over the home config
    Files.writeString(cwd.resolve("graft.config.json"),
      """{"search": {"defaultK": 7}}""")
    assert(GraftConfig.load(cwd, home).defaultK === 7)

    // nothing found → pure defaults
    val empty = Files.createTempDirectory("graft_none")
    assert(GraftConfig.load(empty, empty).defaultK === 10)
  }

  test("user config array REPLACES the default array (mergeWithArrayReplace)") {
    val dir = Files.createTempDirectory("graft_cfg_arr")
    Files.writeString(dir.resolve("graft.config.json"),
      """{"ci": {"doc": {"documentPaths": ["wiki/**/*.md"]}}}""")
    val c = GraftConfig.load(dir, dir)
    // the user's array wins wholesale — no default entries appended
    assert(c.documentPaths === Seq("wiki/**/*.md"))
    // sibling default under the same object survives the merge
    assert(c.ciThreshold === 0.7)
    // untouched default array intact
    assert(GraftConfig.load(Files.createTempDirectory("graft_cfg_arr2"),
      dir.resolve("nohome")).documentPaths ===
      Seq("docs/**/*.md", "README.md"))
  }

  test("mergeDefu: arrays concatenate with user elements first; scalars user-wins") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val user = parse(
      """{"ci": {"doc": {"documentPaths": ["wiki/**/*.md"], "threshold": 0.5}}}""")
    val merged = new GraftConfig(GraftConfig.mergeDefu(user, GraftConfig.Defaults))
    assert(merged.documentPaths ===
      Seq("wiki/**/*.md", "docs/**/*.md", "README.md"))
    assert(merged.ciThreshold === 0.5)
    assert(merged.defaultK === 10)
  }

  test("save round-trips through the loader") {
    val dir = Files.createTempDirectory("graft_cfg_save")
    val f = dir.resolve("graft.config.json")
    val c = GraftConfig.loadFile(f) // defaults
    GraftConfig.save(c.json, f)
    assert(GraftConfig.loadFile(f).defaultK === 10)
  }

  test("custom adapter: registered by class name, usable, duplicate-safe") {
    AdapterRegistry.clear()
    val dir = Files.createTempDirectory("graft_cfg_ca")
    Files.writeString(dir.resolve("graft.config.json"),
      """{"vectorDB": {"provider": "test-mem"},
        |"customAdapters": {"test-mem": "graft.api.TestAdapterFactory"}}"""
        .stripMargin)
    val c = GraftConfig.load(dir, dir)
    assert(c.registerCustomAdapters() === Seq("test-mem"))
    val adapter = c.createAdapter()
    assert(adapter.info("provider") === "memory")
    // second pass: already registered → skipped, not an error
    assert(c.registerCustomAdapters() === Seq.empty)
    // unknown class name → skipped silently (reference catches and
    // continues per-adapter)
    val bad = new GraftConfig(org.json4s.jackson.JsonMethods.parse(
      """{"customAdapters": {"x": "no.such.Class"}}"""))
    assert(bad.registerCustomAdapters() === Seq.empty)
    AdapterRegistry.clear()
  }
}
