package graft
package model

import org.scalatest.funsuite.AnyFunSuite

/** The serve-path session-cache bound ([[LruCache]]): entry count can
  * never exceed the cap, eviction is least-recently-USED (a hot entry
  * survives a cold sweep), and hits never re-run the loader — the
  * memoization contract the derivation counters in
  * [[graft.operators.IncrementalIndex]] depend on. */
class LruSpec extends AnyFunSuite {

  test("bounded at max entries, LRU eviction order, memoized hits") {
    val c = new LruCache[Int, Int](4)
    var loads = 0
    (1 to 10).foreach(i => c.getOrElseUpdate(i) { loads += 1; i * 2 })
    assert(c.size === 4, "census exceeded the bound")
    assert(c.max === 4)
    assert(loads === 10)
    // the most recent keys survive; a hit is a hit (no reload)
    assert(c.getOrElseUpdate(10) { loads += 1; -1 } === 20)
    assert(loads === 10, "a cache hit re-ran the loader")
    // an evicted key reloads
    assert(c.getOrElseUpdate(1) { loads += 1; -1 } === -1)
    assert(loads === 11)
    assert(c.size === 4)
    // access-order: touch the oldest survivor, then overflow — the
    // touched key must survive the next eviction
    assert(c.getOrElseUpdate(8) { loads += 1; -1 } === 16)
    c.getOrElseUpdate(100) { loads += 1; 200 }
    assert(c.getOrElseUpdate(8) { loads += 1; -1 } === 16,
      "a recently-touched entry was evicted before colder ones")
    c.clear()
    assert(c.size === 0)
  }

  test("concurrent loads race safely: one deterministic value, census " +
      "bounded") {
    val c = new LruCache[Int, Int](8)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 64).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = c.getOrElseUpdate(i % 4) { (i % 4) * 7 }
        })
      }
      futs.zipWithIndex.foreach { case (f, i) =>
        assert(f.get() === (i % 4) * 7)
      }
      assert(c.size <= 8)
    } finally pool.shutdown()
  }
}
