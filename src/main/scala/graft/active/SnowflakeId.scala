package graft.active

/** Snowflake id generator (reference C6,
  * `common/SnowflakeIdWorker.java:14-138`): 41-bit millisecond timestamp
  * since 2020-01-01 UTC, 5-bit datacenter + 5-bit worker, 12-bit per-ms
  * sequence; thread-safe, clock-regression guarded. Driver-side,
  * single-writer — ids stamp spawned ECA rules.
  */
final class SnowflakeId(datacenterId: Long = 0L, workerId: Long = 0L) {
  require(datacenterId >= 0 && datacenterId < 32, "datacenterId in [0,31]")
  require(workerId >= 0 && workerId < 32, "workerId in [0,31]")

  /** 2020-01-01T00:00:00Z */
  private val Epoch = 1577836800000L
  private val SeqBits = 12
  private val WorkerBits = 5
  private val DcBits = 5
  private val MaxSeq = (1 << SeqBits) - 1

  private var lastTs = -1L
  private var seq = 0L

  def nextId(now: () => Long = () => System.currentTimeMillis()): Long =
    synchronized {
      var ts = now()
      if (ts < lastTs)
        throw new IllegalStateException(
          s"clock moved backwards: refusing to generate id for ${lastTs - ts} ms")
      if (ts == lastTs) {
        seq = (seq + 1) & MaxSeq
        if (seq == 0) { // sequence exhausted within this millisecond: spin
          while (ts <= lastTs) ts = now()
        }
      } else seq = 0L
      lastTs = ts
      ((ts - Epoch) << (SeqBits + WorkerBits + DcBits)) |
        (datacenterId << (SeqBits + WorkerBits)) |
        (workerId << SeqBits) |
        seq
    }
}
