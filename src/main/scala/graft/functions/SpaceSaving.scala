package graft.functions

/** SPACE-SAVING heavy-hitter summary (Metwally, Agrawal & El Abbadi
  * 2005) — the bounded-memory candidate pass behind q291.
  *
  * One streaming pass with EXACTLY `capacity` counters: a present item
  * increments its counter; a new item evicts the MINIMUM counter and
  * inherits `min + 1`. Two classical facts carry the whole design:
  *
  *  1. every kept counter OVERestimates its item's true partition
  *     frequency (never under), and the minimum counter is ≤ n_p /
  *     capacity;
  *  2. therefore any item with true partition frequency f_p >
  *     n_p / capacity is IN the summary when the partition ends — a
  *     deterministic SUPERSET guarantee, not a probabilistic one
  *     (contrast q137's CMS, which answers point queries with an
  *     ε-overcount but cannot enumerate candidates at all).
  *
  * q291 lifts the per-partition guarantee to the corpus: an item with
  * global frequency f > n / capacity must satisfy f_p > n_p / capacity
  * in at least one partition (if f_p ≤ n_p/c everywhere, summing gives
  * f ≤ n/c), so the UNION of per-partition candidate sets is a
  * superset of the true global hitters — O(partitions × capacity)
  * rows shuffled, never the vocabulary — and one exact recount over
  * the candidates makes the final answer exact and PARTITION-INVARIANT
  * (the summary's content depends on input order; the recounted,
  * thresholded output provably does not — spec'd under adversarial
  * repartitionings).
  *
  * Mutable, driver-free, per-partition object: `mapPartitions` is the
  * honest shape here (the codec precedent, Multimodal.scala) — a
  * bounded-memory imperative stream algorithm with no declarative
  * equivalent; everything around it stays in codegen'd expressions.
  * Cost per item: O(log capacity) via a TreeSet on (count, item).
  */
final class SpaceSaving(capacity: Int) {
  require(capacity > 0, s"space-saving capacity must be positive: $capacity")

  private val counts = new java.util.HashMap[String, Long](capacity * 2)
  private val order = new java.util.TreeSet[(Long, String)](
    new java.util.Comparator[(Long, String)] {
      def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    })

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) {
      order.remove((cur, item))
      counts.put(item, cur + 1)
      order.add((cur + 1, item))
    } else if (counts.size < capacity) {
      counts.put(item, 1L)
      order.add((1L, item))
    } else {
      val min = order.first()
      order.remove(min)
      counts.remove(min._2)
      counts.put(item, min._1 + 1)
      order.add((min._1 + 1, item))
    }
  }

  /** Candidate items (the superset-guaranteed summary keys). */
  def candidates: Iterator[String] = {
    val it = counts.keySet().iterator()
    new Iterator[String] {
      def hasNext: Boolean = it.hasNext
      def next(): String = it.next()
    }
  }
}
