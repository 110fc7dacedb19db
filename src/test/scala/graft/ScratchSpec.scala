package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Scratch naming + lifecycle: the persisted ANN index and the
  * disk-level streaming oracles key their on-disk reuse on these
  * invariants (stable cross-JVM names, no 32-bit collisions, per-JVM
  * isolation, idempotent recursive delete).
  */
class ScratchSpec extends AnyFunSuite {

  test("sharedDir is deterministic and distinct per key") {
    val a1 = Scratch.sharedDir("graft_test_idx", "/root/testdata/sf0.1")
    val a2 = Scratch.sharedDir("graft_test_idx", "/root/testdata/sf0.1")
    val b = Scratch.sharedDir("graft_test_idx", "/root/testdata/sf0.01")
    assert(a1 == a2, "same key must map to the same path across calls")
    assert(a1 != b, "different sf dirs must never share a scratch root")
    // trailing slash is a DIFFERENT key string: callers normalize; the
    // name must still differ rather than silently alias (the r11 bug
    // class was two keys aliasing, not two spellings diverging)
    val c = Scratch.sharedDir("graft_test_idx", "/root/testdata/sf0.1/")
    assert(c != b)
  }

  test("sharedDir names are filesystem-safe and human-debuggable") {
    val p = Scratch.sharedDir("pfx", "/weird dir/sf 0.1$x")
    val name = p.getFileName.toString
    assert(name.startsWith("pfx_"))
    assert(name.matches("[A-Za-z0-9._-]+"),
      s"unsanitized char in scratch name: $name")
    // the sanitized basename stays visible for debugging
    assert(name.contains("sf_0.1_x"))
  }

  test("keys that collide under String.hashCode get distinct dirs") {
    // classic 32-bit collision pair; the r11 scheme (hashCode hex)
    // mapped these to the SAME directory
    val k1 = "Aa"; val k2 = "BB"
    assert(k1.hashCode == k2.hashCode)
    assert(Scratch.sharedDir("pfx", k1) != Scratch.sharedDir("pfx", k2))
  }

  test("jvmDir isolates concurrent JVMs and reuses within one") {
    val shared = Scratch.sharedDir("pfx", "/root/testdata/sf0.1")
    val mine = Scratch.jvmDir("pfx", "/root/testdata/sf0.1")
    assert(mine.toString ==
      shared.toString + "_pid" + ProcessHandle.current().pid())
    assert(Scratch.jvmDir("pfx", "/root/testdata/sf0.1") == mine)
  }

  test("deleteRecursively removes trees and is idempotent") {
    val root = Files.createTempDirectory("graft_scratch_spec")
    Files.createDirectories(root.resolve("a/b"))
    Files.writeString(root.resolve("a/b/f.txt"), "x")
    Files.writeString(root.resolve("top.txt"), "y")
    Scratch.deleteRecursively(root)
    assert(!Files.exists(root))
    Scratch.deleteRecursively(root) // absent path: no-op, no throw
    assert(!Files.exists(Paths.get(root.toString)))
  }
}
