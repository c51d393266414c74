package graft.streaming

import graft.store.Db

/** Test-only bridge into [[StreamIngest.nonFatalFold]]'s failure-streak
  * accounting (package-private to graft.streaming): lets specs outside
  * this package (ServeSpec's `_status` case) drive forced failed and
  * successful maintenance cadence points deterministically.
  */
object MaintTestHook {
  /** One forced FAILED cadence point for `db`'s warehouse. */
  def forceFailure(db: Db): Unit =
    StreamIngest.nonFatalFold(db)(throw new RuntimeException("forced"))

  /** One successful cadence point (resets the streak). */
  def forceSuccess(db: Db): Unit =
    StreamIngest.nonFatalFold(db)(())

  /** Drop the in-JVM counter, leaving only the persisted manifest
    * property — emulates a `_status` reader in ANOTHER process.
    */
  def clearInJvm(db: Db): Unit =
    StreamIngest.clearInJvmStreak(db.warehouse)
}
