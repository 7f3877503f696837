package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.DeltaDv

/** Property tests for the Delta DV wire format — these are exactly
  * the bytes a stock reader consumes, so the codecs get adversarial
  * inputs, not just the fixtures the specs use. Seeded sampler, same
  * convention as [[PropertySpec]] (the scalatest-scalacheck bridge
  * isn't in the offline cache). */
class DeltaDvPropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T], trials: Int = 24)(body: T => Unit): Unit = {
    var seed = Seed(42L)
    (0 until trials).foreach { _ =>
      g.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  test("bitmap serialize/deserialize round-trips arbitrary position sets") {
    val positions = Gen.listOf(Gen.chooseNum(0L, 1L << 40))
    forAll(positions) { ps =>
      val distinct = ps.distinct.sorted
      val bytes = DeltaDv.serializeBitmap(distinct.iterator)
      assert(DeltaDv.deserializeBitmap(bytes).toSeq === distinct)
    }
  }

  test("bitmap format is canonical: same set in any order, same bytes") {
    val positions = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1L << 33))
    forAll(positions) { ps =>
      val a = DeltaDv.serializeBitmap(ps.iterator)
      val b = DeltaDv.serializeBitmap(scala.util.Random.shuffle(ps).iterator)
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("Base85 encode/decode round-trips arbitrary byte payloads") {
    val payload = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    forAll(payload) { bs =>
      val bytes = bs.toArray
      val enc = DeltaDv.encodeBase85(bytes)
      assert(enc.length % 5 === 0)
      assert(DeltaDv.decodeBase85(enc, bytes.length).toSeq === bytes.toSeq)
    }
  }

  test("UUID Base85 codec round-trips and is 20 chars, prefix-tolerant") {
    forAll(Gen.uuid) { u =>
      val enc = DeltaDv.encodeUuid(u)
      assert(enc.length === 20)
      assert(DeltaDv.decodeUuid(enc) === (("", u)))
      assert(DeltaDv.decodeUuid("ab/" + enc) === (("ab/", u)))
    }
  }

  test("negative positions refuse; corrupt magic refuses") {
    intercept[IllegalArgumentException] {
      DeltaDv.serializeBitmap(Iterator(-1L))
    }
    val good = DeltaDv.serializeBitmap(Iterator(1L, 2L))
    good(0) = (good(0) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      DeltaDv.deserializeBitmap(good)
    }
  }
}
