package graft.storage

/** Forked-JVM racer for [[CrossProcessCommitSpec]]: spins metadata-only
  * commits (fresh=Nil, carryOver=parent files, dataChange=false) against a
  * table another OS process is committing to concurrently. Needs NO
  * SparkSession — the commit protocol is pure filesystem (manifest read +
  * hard-link CAS), which is exactly the property under test.
  *
  * args: tableRoot rounds goFile. Creates `goFile + ".ready"` at startup,
  * waits for `goFile` to appear (start barrier), runs `rounds` commit
  * attempts, prints `WINS=n` / `LOSSES=m`, exits 0. */
object RaceCommitMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val rounds = args(1).toInt
    val go = java.nio.file.Paths.get(args(2))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(args(2) + ".ready"))
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(go)) {
      if (System.nanoTime() > deadline) sys.exit(3)
      Thread.sleep(5)
    }
    val t = CowTable(null, root, TableConfig("t", Seq("id")))
    var wins = 0
    var losses = 0
    var i = 0
    while (i < rounds) {
      val parent = t.currentVersion
      val m = t.manifest(parent)
      try {
        t.commitAt(parent, Nil, m.files,
          CowTable.structFromJson(m.schemaJson), dataChange = false)
        wins += 1
      } catch { case _: ConcurrentWriteException => losses += 1 }
      i += 1
    }
    println(s"WINS=$wins")
    println(s"LOSSES=$losses")
  }
}
