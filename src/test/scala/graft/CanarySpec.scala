package graft

import org.scalatest.funsuite.AnyFunSuite

/** The host-speed canary must be a sane, strictly positive CPU-seconds
  * measure — artifacts divide by it to normalize across eras, so a zero
  * (clock not advancing / workload DCE'd away) or wild value would turn
  * every cross-era ratio into nonsense silently.
  */
class CanarySpec extends AnyFunSuite {
  test("cpuCanary returns positive, bounded, repeatable cpu-seconds") {
    val a = ScaleSmoke.cpuCanary()
    val b = ScaleSmoke.cpuCanary()
    assert(a > 0.05 && a < 60.0, s"canary out of range: $a")
    // repeatability on one box within one JVM: same fixed workload, so
    // two back-to-back measures should agree within 3x even under load
    // (JIT warms between them — b is typically the faster one)
    assert(math.max(a, b) / math.min(a, b) < 3.0, s"canary unstable: $a vs $b")
  }
}
