package graft

import java.util.concurrent.atomic.AtomicBoolean
import java.util.concurrent.CountDownLatch

import graft.operators.Par

/** Failure semantics of the driver-side job-overlap mechanism
  * (operators.Par) — the contract the index lifecycles lean on:
  * addSegment/addVectors call invalidate() after Par.run throws, which
  * is only safe if NO task is still running at that point (a straggler
  * writer would append into an artifact the caller just invalidated).
  */
class ParSpec extends SparkSpec {

  test("a failing task does not rethrow until every other task finished") {
    val slowDone = new AtomicBoolean(false)
    val boom = new IllegalStateException("boom")
    val thrown = intercept[IllegalStateException] {
      Par.run(
        () => throw boom,
        () => { Thread.sleep(250); slowDone.set(true) },
        () => { Thread.sleep(150); () })
    }
    assert(thrown eq boom)
    // the rethrow happened only after the slow writer completed — the
    // invalidate-never-races-a-live-writer guarantee
    assert(slowDone.get())
  }

  test("first failure (task order) is rethrown, later ones suppressed") {
    val a = new IllegalStateException("first-by-task-order")
    val b = new IllegalArgumentException("second")
    val bThrown = new CountDownLatch(1)
    val thrown = intercept[IllegalStateException] {
      Par.run(
        // task 0 fails LAST chronologically but first in task order —
        // the contract is deterministic on task order, not racy on
        // wall-clock order
        () => { bThrown.await(); Thread.sleep(50); throw a },
        () => { try throw b finally bThrown.countDown() })
    }
    assert(thrown eq a)
    assert(thrown.getSuppressed.toSeq.contains(b))
  }

  test("interrupting the caller still awaits every task (flag restored)") {
    val done = (0 until 3).map(_ => new AtomicBoolean(false))
    @volatile var caught: Throwable = null
    @volatile var flagRestored = false
    val t = new Thread(() => {
      try Par.run(
        () => { Thread.sleep(300); done(0).set(true) },
        () => { Thread.sleep(350); done(1).set(true) },
        () => { Thread.sleep(200); done(2).set(true) })
      catch { case e: Throwable => caught = e }
      flagRestored = Thread.currentThread().isInterrupted
    })
    t.start()
    Thread.sleep(80) // tasks are mid-sleep on the pool threads
    t.interrupt()
    t.join(10000)
    assert(!t.isAlive)
    // every task ran to completion despite the caller's interrupt —
    // the round-15 advisor hole (early return with live writers)
    assert(done.forall(_.get()))
    assert(caught != null && caught.isInstanceOf[InterruptedException])
    assert(flagRestored, "interrupt status must be restored before rethrow")
  }

  test("task failure wins over a concurrent caller interrupt") {
    val boom = new IllegalStateException("boom")
    val slowDone = new AtomicBoolean(false)
    @volatile var caught: Throwable = null
    val t = new Thread(() => {
      try Par.run(
        () => { Thread.sleep(150); throw boom },
        () => { Thread.sleep(300); slowDone.set(true) })
      catch { case e: Throwable => caught = e }
    })
    t.start()
    Thread.sleep(50)
    t.interrupt()
    t.join(10000)
    assert(!t.isAlive)
    assert(slowDone.get())
    // the task's failure is the primary error; the interrupt is
    // attached as suppressed, not lost
    assert(caught eq boom)
    assert(caught.getSuppressed.exists(_.isInstanceOf[InterruptedException]))
  }

  test("job descriptions/groups (inheritable locals) reach the pool threads") {
    val sc = spark.sparkContext
    sc.setJobDescription("par-spec-desc")
    try {
      @volatile var seen: String = null
      Par.run(
        () => { seen = sc.getLocalProperty("spark.job.description") },
        () => ())
      assert(seen == "par-spec-desc")
    } finally sc.setJobDescription(null)
  }
}
