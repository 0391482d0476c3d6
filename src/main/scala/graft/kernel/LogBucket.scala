package graft.kernel

/** Fuzzy log-bucket quantization, ≅ AbstractShingler._getLogBucketRange
  * (/root/reference/mcrit/shinglers/AbstractShingler.py:28-39); golden table
  * at /root/reference/tests/testShingling.py:22-40.
  *
  * value → (lo, mid, hi) where mid is `value` rounded up to a multiple of
  * window = 2^(floor(floor(log2 v)/2)); powers of two halve the left window.
  */
object LogBucket {
  def range(value: Long): (Long, Long, Long) = {
    // mirror Python: math.log(value, 2) == log(v)/log(2) in doubles
    val logValue = if (value > 0) math.log(value.toDouble) / math.log(2.0) else 0.0
    val flooredExponent = math.floor(logValue)
    if (flooredExponent < 2) {
      (math.max(value - 1, 0), value, value + 1)
    } else {
      val windowSize = math.pow(2.0, math.floor(flooredExponent / 2)).toLong
      val middleBucket = windowSize * math.ceil(value.toDouble / windowSize).toLong
      if (logValue % 2 == 0)
        (middleBucket - windowSize / 2, middleBucket, middleBucket + windowSize)
      else
        (middleBucket - windowSize, middleBucket, middleBucket + windowSize)
    }
  }
}
