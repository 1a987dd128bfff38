package graft.operators

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpecBase

/** Concurrency + lifecycle contract of the shared fixture-table memo
  * (the [[PlanMemo]] discipline applied to on-disk tables): builds run
  * outside the map, a racing pair both build, the loser's directory is
  * DELETED and both callers adopt the winner's path; release drains by
  * key and removes the directory from disk. */
class FixtureTablesSpec extends SparkSpecBase {

  private def exists(path: String): Boolean =
    new java.io.File(path).exists()

  private def mark(path: String): String = {
    val f = new java.io.File(path, "built")
    java.nio.file.Files.write(f.toPath, "x".getBytes("UTF-8"))
    path
  }

  test("two racing first builders: both build, exactly one directory " +
      "survives, both callers hold the winner's path; release deletes " +
      "it and a rebuild starts fresh") {
    val tables = new FixtureTables[String]("graft-fixture-spec-")(identity)
    val builds = new AtomicInteger(0)
    val bothInBuild = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    val got =
      try {
        val tasks = (1 to 2).map { _ =>
          pool.submit(new java.util.concurrent.Callable[String] {
            def call(): String = tables(spark, "dirA") { path =>
              builds.incrementAndGet()
              // both threads mid-build: builds run OUTSIDE the map
              bothInBuild.await(30, TimeUnit.SECONDS)
              mark(path)
            }
          })
        }
        tasks.map(_.get(60, TimeUnit.SECONDS))
      } finally pool.shutdownNow()
    assert(builds.get() == 2, "both racers must have built")
    assert(got.toSet.size == 1, s"callers diverged: $got")
    val winner = got.head
    assert(exists(winner) && exists(s"$winner/built"))
    // the loser's temp directory was deleted, not leaked: of all
    // matching temp dirs only the winner's remains populated
    val tmpRoot = new java.io.File(winner).getParentFile
    val leaked = tmpRoot.listFiles()
      .filter(_.getName.startsWith("graft-fixture-spec-"))
      .filter(d => new java.io.File(d, "built").exists())
      .map(_.toString).toSeq
    assert(leaked == Seq(winner), s"leaked loser fixture dirs: $leaked")
    // memo hit: no rebuild, same path
    assert(tables(spark, "dirA")(p => mark(p)) == winner)
    assert(builds.get() == 2)
    // distinct data dirs are distinct fixtures
    val other = tables(spark, "dirB")(p => mark(p))
    assert(other != winner && exists(other))
    // release drains both and removes the directories
    tables.release()
    assert(!exists(winner) && !exists(other))
    // a rebuild after release starts a fresh directory
    val fresh = tables(spark, "dirA")(p => mark(p))
    assert(fresh != winner && exists(fresh))
    tables.release()
    assert(!exists(fresh))
  }
}
