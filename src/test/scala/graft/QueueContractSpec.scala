package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{ContractConsumer, InMemoryTopic}

/** Pins the broker contract [[graft.streaming.InMemoryTopic]] documents
  * for the S3/S4 queue transport: per-partition ordering, key-partition
  * affinity, poll batching, committed-offset resume, at-least-once
  * redelivery of polled-but-uncommitted records.
  */
class QueueContractSpec extends AnyFunSuite {

  test("per-partition order and key affinity") {
    val t = new InMemoryTopic(4)
    val acks = (0 until 100).map(i => t.produce(s"k${i % 7}", s"v$i"))
    // same key -> same partition, offsets strictly increasing per partition
    acks.zipWithIndex.groupBy { case (_, i) => i % 7 }.foreach { case (_, as) =>
      assert(as.map(_._1._1).distinct.size == 1, "key moved partitions")
    }
    val c = new ContractConsumer(t, "g0")
    val all = c.poll(1000)
    all.groupBy(_.partition).foreach { case (_, rs) =>
      assert(rs.map(_.offset) == rs.map(_.offset).sorted)
      // per-partition arrival order == produce order (value index order)
      val idx = rs.map(_.value.drop(1).toInt)
      assert(idx == idx.sorted, s"reordered within partition: $idx")
    }
    assert(all.size == 100 && c.lag == 0)
  }

  test("poll batching bounds a micro-batch like maxOffsetsPerTrigger") {
    val t = new InMemoryTopic(2)
    (0 until 50).foreach(i => t.produce(null, s"v$i"))
    val c = new ContractConsumer(t, "g1")
    val b1 = c.poll(10)
    assert(b1.size == 20) // 10 per partition x 2
    assert(c.lag == 30)
    val rest = Iterator.continually(c.poll(10)).takeWhile(_.nonEmpty).toSeq
    assert(b1.size + rest.map(_.size).sum == 50)
  }

  test("crash without commit redelivers everything (at-least-once)") {
    val t = new InMemoryTopic(2)
    (0 until 20).foreach(i => t.produce(s"k$i", s"v$i"))
    val c1 = new ContractConsumer(t, "g2")
    val seen1 = c1.poll(100)
    assert(seen1.size == 20)
    // crash: no commitSync -> a new consumer of the same group must see
    // every record again
    val c2 = new ContractConsumer(t, "g2")
    val seen2 = c2.poll(100)
    assert(seen2.map(r => (r.partition, r.offset)).sorted ==
      seen1.map(r => (r.partition, r.offset)).sorted)
  }

  test("committed offsets survive a crash; only the tail redelivers") {
    val t = new InMemoryTopic(1)
    (0 until 10).foreach(i => t.produce("k", s"v$i"))
    val c1 = new ContractConsumer(t, "g3")
    assert(c1.poll(6).size == 6)
    c1.commitSync() // offsets 0-5 done
    assert(c1.poll(2).size == 2) // 6,7 polled but NOT committed
    val c2 = new ContractConsumer(t, "g3") // crash + restart
    val redelivered = c2.poll(100)
    // resumes from the COMMIT (6), so 6..9 arrive: the uncommitted 6,7
    // are redelivered, the committed 0..5 are not
    assert(redelivered.map(_.offset) == Seq(6L, 7L, 8L, 9L))
  }

  test("independent groups consume independently") {
    val t = new InMemoryTopic(2)
    (0 until 8).foreach(i => t.produce(s"k$i", s"v$i"))
    val a = new ContractConsumer(t, "ga")
    val b = new ContractConsumer(t, "gb")
    assert(a.poll(100).size == 8)
    a.commitSync()
    assert(b.poll(100).size == 8) // ga's commit is invisible to gb
  }
}
