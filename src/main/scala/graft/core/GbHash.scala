package graft.core

/** Tabulation ("zobrist") hash family of the reference engine, re-derived
  * from public knowledge only:
  *
  *  - table derivation: `/root/reference/src/hash.cpp:12-57` (`hashinit`):
  *    glibc `srand(1945687)` then four `rand()` calls per cell over a
  *    256x256 uint64 table. The glibc generator is the public TYPE_3
  *    additive-feedback generator (x[i] = x[i-31] + x[i-3] mod 2^32,
  *    output = x[i] >> 1), documented in glibc's stdlib/random_r.c.
  *  - `hash64b` / `hash64` / `hash32` / `hash32h` / `hash64h` / `hash8`:
  *    `/root/reference/src/hash.h:88-118`, `/root/reference/src/hash.cpp:58-200`.
  *  - `uh48(url) = hash64b(url) & 0xffffffffffff`:
  *    `/root/reference/src/Spider.h:870-873`, key mask `Spider.h:412-413`.
  *  - probable docId + fake firstIp for add-url seeds:
  *    `/root/reference/src/Titledb.h:56-70`, `/root/reference/src/Spider.cpp:14908-14940`.
  *
  * Self-check: `g_hashtab[0][0] == 6720717044602784129L`
  * (`/root/reference/src/hash.cpp:48`). Everything downstream — the URL-seen
  * set, spiderdb keys, crawl ordering — byte-depends on this table.
  */
object GbHash {

  /** glibc TYPE_3 `rand()` (deg=31, sep=3). Public algorithm. */
  final class GlibcRand(seed: Int) {
    private val r = new Array[Int](31)
    private var f = 3 // fptr index
    private var p = 0 // rptr index
    locally {
      r(0) = if (seed == 0) 1 else seed
      var i = 1
      while (i < 31) {
        // Schrage's trick for 16807 * r[i-1] mod 2147483647 in int32.
        val prev = r(i - 1)
        val hi = prev / 127773
        val lo = prev % 127773
        var word = 16807 * lo - 2836 * hi
        if (word < 0) word += 2147483647
        r(i) = word
        i += 1
      }
      // warm-up: glibc discards 10*deg outputs
      var k = 0
      while (k < 310) { next(); k += 1 }
    }
    def next(): Int = {
      val v = r(f) + r(p) // int32 wrap-around add == uint32 mod 2^32
      r(f) = v
      f += 1; if (f == 31) f = 0
      p += 1; if (p == 31) p = 0
      (v >>> 1) & 0x7fffffff
    }
  }

  /** The 256x256 tabulation table (512 KiB), built once per JVM. */
  val table: Array[Long] = {
    val rnd = new GlibcRand(1945687)
    val t = new Array[Long](256 * 256)
    var i = 0
    while (i < 256 * 256) {
      var h: Long = rnd.next().toLong
      if (rnd.next() > (0x7fffffff / 2)) h |= 0x80000000L
      h <<= 32
      h |= rnd.next().toLong
      if (rnd.next() > (0x7fffffff / 2)) h |= 0x80000000L
      t(i) = h
      i += 1
    }
    require(t(0) == 6720717044602784129L,
      s"g_hashtab[0][0] mismatch: ${t(0)}")
    t
  }

  @inline private def tab(i: Int, c: Int): Long = table(((i & 0xff) << 8) | (c & 0xff))

  /** hash64b: C-string hash, index wraps mod 256 (hash.h:88-96). */
  def hash64b(s: Array[Byte], startHash: Long = 0L): Long = {
    var h = startHash
    var i = 0
    while (i < s.length && s(i) != 0) { h ^= tab(i, s(i)); i += 1 }
    h
  }
  def hash64b(s: String): Long = hash64b(bytes(s), 0L)
  def hash64b(s: String, startHash: Long): Long = hash64b(bytes(s), startHash)

  /** hash64 over an explicit length (hash.h:98-106). */
  def hash64(s: Array[Byte], off: Int, len: Int, startHash: Long): Long = {
    var h = startHash
    var i = 0
    while (i < len) { h ^= tab(i, s(off + i)); i += 1 }
    h
  }
  def hash64(s: String, startHash: Long = 0L): Long = { val b = bytes(s); hash64(b, 0, b.length, startHash) }

  /** hash64h: combine two 64-bit hashes, little-endian byte order (hash.cpp:183-200). */
  def hash64h(h1: Long, h2: Long): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h ^= tab(i, (h1 >>> (8 * i)).toInt); i += 1 }
    while (i < 16) { h ^= tab(i, (h2 >>> (8 * (i - 8))).toInt); i += 1 }
    h
  }

  /** hash32 with explicit length (hash.cpp:113-121); table value truncated to 32 bits. */
  def hash32(s: Array[Byte], off: Int, len: Int, startHash: Int = 0): Int = {
    var h = startHash
    var i = 0
    while (i < len) { h ^= tab(i, s(off + i)).toInt; i += 1 }
    h
  }
  def hash32(s: String): Int = { val b = bytes(s); hash32(b, 0, b.length, 0) }

  /** hash32n: C-string variant (hash.cpp:82-90). */
  def hash32n(s: String): Int = {
    val b = bytes(s)
    var h = 0
    var i = 0
    while (i < b.length && b(i) != 0) { h ^= tab(i, b(i)).toInt; i += 1 }
    h
  }

  /** hash32h: combine two 32-bit hashes, little-endian (hash.cpp:166-181).
    * Shard function of the reference: `hash32h(firstIp, 0x123456)`
    * (`Hostdb.cpp:2543`). */
  def hash32h(h1: Int, h2: Int): Int = {
    var h = 0L
    var i = 0
    while (i < 4) { h ^= tab(i, h1 >>> (8 * i)); i += 1 }
    while (i < 8) { h ^= tab(i, h2 >>> (8 * (i - 4))); i += 1 }
    h.toInt
  }

  /** hash8 (hash.cpp:60-69): used for the domain bits of probable docIds. */
  def hash8(s: Array[Byte], off: Int, len: Int): Int = {
    var h = 0
    var i = 0
    while (i < len) { h ^= tab(i, s(off + i)).toInt & 0xff; i += 1 }
    h & 0xff
  }
  def hash8(s: String): Int = { val b = bytes(s); hash8(b, 0, b.length) }

  /** 48-bit URL identity: the key of the URL-seen set (Spider.h:870-873). */
  def uh48(url: String): Long = hash64b(url) & 0xffffffffffffL

  val DocIdMask = 0x0000003fffffffffL

  /** Titledb.h:56-70 — bits 6-13 replaced by hash8(domain). */
  def probableDocId(url: String, domain: String): Long = {
    var d = hash64b(url) & DocIdMask
    d &= 0xffffffffffffc03fL
    d |= (hash8(domain).toLong << 6)
    d
  }

  /** Fake firstIp for add-url/seed requests (Spider.cpp:14908-14940):
    * low 32 bits of the probable docId, 0/-1 coerced to 1. */
  def fakeFirstIp(url: String, domain: String): Int = {
    val ip = (probableDocId(url, domain) & 0xffffffffL).toInt
    if (ip == 0 || ip == -1) 1 else ip
  }

  /** URLs are ASCII after canonicalization (punycode + %-encoding); for raw
    * inputs we hash the ISO-8859-1 (byte-preserving) image like the C code
    * hashes raw chars. */
  @inline def bytes(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
}
