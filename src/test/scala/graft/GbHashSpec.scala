package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbHash

class GbHashSpec extends AnyFunSuite {

  test("g_hashtab[0][0] matches the reference's published constant") {
    // /root/reference/src/hash.cpp:48
    assert(GbHash.table(0) == 6720717044602784129L)
  }

  test("hash64b is xor-tabulation over prefix bytes") {
    // manual fold against the table
    val s = "http://www.example.com/"
    val b = GbHash.bytes(s)
    var h = 0L
    for (i <- b.indices) h ^= GbHash.table(((i & 0xff) << 8) | (b(i) & 0xff))
    assert(GbHash.hash64b(s) == h)
  }

  test("hash64b stops at NUL like a C string") {
    assert(GbHash.hash64b(Array[Byte]('a', 0, 'b')) == GbHash.hash64b("a"))
  }

  test("index wraps mod 256 for long inputs") {
    val long = "x" * 300
    val b = GbHash.bytes(long)
    var h = 0L
    for (i <- b.indices) h ^= GbHash.table(((i % 256) << 8) | (b(i) & 0xff))
    assert(GbHash.hash64b(long) == h)
  }

  test("uh48 is the low 48 bits and is stable") {
    val u = "http://www.h0.test/"
    assert(GbHash.uh48(u) == (GbHash.hash64b(u) & 0xffffffffffffL))
    assert(GbHash.uh48(u) >= 0L)
    assert(GbHash.uh48(u) == GbHash.uh48(u))
  }

  test("hash32h differs from plain xor and is deterministic") {
    val a = GbHash.hash32h(0x7f000001, 0x123456)
    assert(a == GbHash.hash32h(0x7f000001, 0x123456))
    assert(a != (0x7f000001 ^ 0x123456))
  }

  test("fakeFirstIp never returns 0 or -1") {
    val ip = GbHash.fakeFirstIp("http://www.h1.test/", "h1.test")
    assert(ip != 0 && ip != -1)
  }

  test("hash64h/hash32h combine little-endian bytes") {
    // spot check: hash64h(0,0) == xor of tab[i][0] for i<16
    var h = 0L
    for (i <- 0 until 16) h ^= GbHash.table(i << 8)
    assert(GbHash.hash64h(0L, 0L) == h)
  }
}
