package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** Per-sink streaming cursors: replay semantics, JSON round trip, and the
  * legacy-scalar migration (a pre-upgrade warehouse must keep its
  * crash-replay guard when its writer moves to a named cursor).
  */
class StreamCursorSpec extends AnyFunSuite {

  private def base = ManifestState(1L, 0L, Vector.empty, Vector.empty)

  test("pre-upgrade manifest: named sinks fall back to the legacy scalar") {
    // old code left its one writer's cursor in the scalar with an empty
    // map — a replayed batch <= 12 must NOT commit twice post-upgrade
    val legacy = base.copy(streamBatch = 12L)
    assert(legacy.streamBatchFor("index") == 12L)
    assert(legacy.streamBatchFor("dedup") == 12L)
    assert(legacy.streamBatchFor("") == 12L)
  }

  test("pre-upgrade manifest: POST-migration sink kinds never inherit the scalar") {
    // bm25/sketch/neardedup writers postdate the cursor map — none of
    // them can have written the legacy scalar, so inheriting it on a
    // pre-upgrade warehouse would make a newly-attached sink silently
    // skip its own batches 0..streamBatch
    val legacy = base.copy(streamBatch = 12L)
    for (sink <- Seq("bm25", "sketch", "neardedup", "my-custom-sink"))
      assert(legacy.streamBatchFor(sink) == -1L,
        s"new sink kind '$sink' must start at -1, not at the old writer's cursor")
    assert(ManifestState.LegacySinks == Set("", "dedup", "index"),
      "the legacy set is frozen — never add post-migration sinks to it")
  }

  test("post-migration: named sinks are independent; new sinks start at -1") {
    val m = base.withStreamBatch("dedup", 5L)
    assert(m.streamBatchFor("dedup") == 5L)
    assert(m.streamBatchFor("neardedup") == -1L,
      "a sibling sink's cursor must not gate a new sink")
    assert(m.streamBatchFor("") == -1L)
  }

  test("plain writer marks the warehouse post-migration via its named entry") {
    val m = base.withStreamBatch("", 7L)
    assert(m.streamBatch == 7L)
    assert(m.streamBatchFor("") == 7L)
    // the map is non-empty now, so a named sink does NOT inherit the
    // plain writer's cursor (that was the shared-scalar bug)
    assert(m.streamBatchFor("index") == -1L)
  }

  test("cursors are monotonic and survive the JSON round trip") {
    val m = base
      .withStreamBatch("a", 3L).withStreamBatch("a", 1L) // no regression
      .withStreamBatch("b", 0L).withStreamBatch("", 9L)
    assert(m.streamBatchFor("a") == 3L)
    val rt = Manifest.parse(m.json)
    assert(rt.streamBatches == m.streamBatches)
    assert(rt.streamBatch == m.streamBatch)
    assert(rt.streamBatchFor("a") == 3L && rt.streamBatchFor("b") == 0L)
  }

  test("pending claims + their tentative dirs survive the JSON round " +
      "trip; a pre-field manifest parses with empty claimDirs") {
    val m = base.copy(
      pending = Map(7L -> 123456789L, 9L -> 987654321L),
      claimDirs = Map(7L -> "tmp-tx-0a1b/with spaces+units"))
    val rt = Manifest.parse(m.json)
    assert(rt.pending == m.pending)
    assert(rt.claimDirs == m.claimDirs,
      "tentative dir names (arbitrary UTF-8) must round-trip exactly")
    // a manifest written before the field existed has no claimDirsB64
    // line — it must parse to an EMPTY map (the conservative global-hold
    // vacuum path), not fail
    val legacy = Manifest.parse(
      m.copy(claimDirs = Map.empty).json.replace(",\"claimDirsB64\":\"\"", ""))
    assert(legacy.pending == m.pending && legacy.claimDirs.isEmpty)
  }
}
