package graft

import graft.streaming.StreamServe
import org.scalatest.funsuite.AnyFunSuite

/** The one-shutdown-hook contract: repeated [[StreamServe]] temp-root
  * requests enqueue paths on the static cleanup queue instead of
  * registering one JVM shutdown hook each — a long serving session's hook
  * count stays constant (the round-7 watch item). */
class StreamServeHookSpec extends AnyFunSuite {

  test("temp roots enqueue on one static hook; registrations never grow") {
    val regsBefore = StreamServe.hookRegistrations.get()
    assert(regsBefore === 1, "exactly one hook registered at class init")
    val qBefore = StreamServe.tempRoots.size()
    val roots = (1 to 5).map(_ => StreamServe.tempRoot("graft_hookspec_"))
    assert(StreamServe.hookRegistrations.get() === regsBefore,
      "tempRoot must not register additional shutdown hooks")
    assert(StreamServe.tempRoots.size() === qBefore + 5,
      "each invocation must enqueue its root for the static hook")
    // the dirs exist now; reclamation is the hook's job at JVM exit —
    // clean up here so repeated test runs don't litter /tmp
    roots.foreach { (r: String) =>
      val p = java.nio.file.Paths.get(r)
      assert(java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.deleteIfExists(p)
    }
  }
}
