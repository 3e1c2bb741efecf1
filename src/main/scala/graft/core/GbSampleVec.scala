package graft.core

import scala.collection.mutable.ArrayBuffer

/** The page-sample-vector + similarity pair behind the reference's
  * `percentChanged` (which, quirk preserved, is a SIMILARITY: 100 means
  * the page did not change).
  *
  *  - `XmlDoc::getPageSampleVector` (XmlDoc.cpp:9527-9541) →
  *    `computeVector` (XmlDoc.cpp:9543-9660): up to 31 unique 32-bit
  *    word ids (SAMPLE_VECTOR_SIZE 128, Msg40.h:8), subsampled via a
  *    top-byte mask of the 48-bit termid when the doc has ≥4× more
  *    words than fit, sorted unsigned-ascending, 0-terminated.
  *  - `computeSimilarity` (XmlDoc.cpp:9893-10038) with no scores and no
  *    query: percent = 100 · 2·matches / (n0 + n1); empty vector on
  *    either side → 0.
  *  - `XmlDoc::getPercentChanged` (XmlDoc.cpp:9804-9824): percentChanged
  *    = pageSimilarity(oldDoc); the reply's perDay rate divides by
  *    SECONDS (`float numDays = spideredTime - oldSpideredTime`,
  *    XmlDoc.cpp:27194-27198 — misnamed, quirk preserved in
  *    `frontier.Crawl.repliesOf`).
  *
  * Word ids are `hash64Lower_utf8` (hash.h:172-230) over the alnum word
  * runs of the document's TEXT nodes — exactly the words that carry
  * non-zero wordIds in the reference's Words array: tag nodes (including
  * TAG_SCRIPTTEXT script bodies and comments, XmlNode.h:27 isTag =
  * nodeId>0) become wid-0 "tag words" there and are skipped by
  * computeVector's `wids[i]==0` check.
  * Divergences, documented: (a) multibyte lowercasing uses Java's
  * Character.toLowerCase instead of the reference's ucToLower tables;
  * (b) alnum-ness of multibyte chars uses Character.isLetterOrDigit.
  * Both agree on ASCII/Latin-1, which the corpus exercises.
  */
object GbSampleVec {

  val MaxTerms = 31 // SAMPLE_VECTOR_SIZE/4 - 1 (Msg40.h:8)

  /** hash64Lower_utf8 (hash.h:172-230): per utf8 char, ascii lowered
    * with to_lower_a, multibyte lowered via unicode and re-encoded; the
    * tabulation index advances per BYTE and wraps at 256 (uint8_t i). */
  def hash64LowerUtf8(s: Array[Byte], off: Int, len: Int): Long = {
    var h = 0L
    var i = 0 // uint8 wrap via & 0xff below
    var p = off
    val end = off + len
    while (p < end) {
      val b = s(p) & 0xff
      if (b < 0x80) {
        val lc = if (b >= 'A' && b <= 'Z') b + 32 else b
        h ^= GbHash.table(((i & 0xff) << 8) | lc)
        i += 1
        p += 1
      } else {
        val cs = utf8Size(b)
        val cp = decodeUtf8(s, p, end)
        val lo = Character.toLowerCase(cp)
        var tmp = new Array[Byte](4)
        val n = encodeUtf8(lo, tmp)
        if (n == 0) { // undecodable: hash raw bytes (hash.h:210-218)
          var k = 0
          while (k < cs && p + k < end) {
            h ^= GbHash.table(((i & 0xff) << 8) | (s(p + k) & 0xff)); i += 1; k += 1
          }
        } else {
          var k = 0
          while (k < n) { h ^= GbHash.table(((i & 0xff) << 8) | (tmp(k) & 0xff)); i += 1; k += 1 }
        }
        p += math.max(cs, 1)
      }
    }
    h
  }

  @inline private def utf8Size(b: Int): Int =
    if (b < 0x80) 1 else if ((b & 0xe0) == 0xc0) 2 else if ((b & 0xf0) == 0xe0) 3
    else if ((b & 0xf8) == 0xf0) 4 else 1

  private def decodeUtf8(s: Array[Byte], p: Int, end: Int): Int = {
    val b0 = s(p) & 0xff
    val cs = utf8Size(b0)
    if (p + cs > end) return b0
    cs match {
      case 1 => b0
      case 2 => ((b0 & 0x1f) << 6) | (s(p + 1) & 0x3f)
      case 3 => ((b0 & 0x0f) << 12) | ((s(p + 1) & 0x3f) << 6) | (s(p + 2) & 0x3f)
      case _ => ((b0 & 0x07) << 18) | ((s(p + 1) & 0x3f) << 12) | ((s(p + 2) & 0x3f) << 6) | (s(p + 3) & 0x3f)
    }
  }

  private def encodeUtf8(cp: Int, out: Array[Byte]): Int = {
    if (cp < 0x80) { out(0) = cp.toByte; 1 }
    else if (cp < 0x800) { out(0) = (0xc0 | (cp >> 6)).toByte; out(1) = (0x80 | (cp & 0x3f)).toByte; 2 }
    else if (cp < 0x10000) {
      out(0) = (0xe0 | (cp >> 12)).toByte; out(1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
      out(2) = (0x80 | (cp & 0x3f)).toByte; 3
    } else if (cp <= 0x10ffff) {
      out(0) = (0xf0 | (cp >> 18)).toByte; out(1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
      out(2) = (0x80 | ((cp >> 6) & 0x3f)).toByte; out(3) = (0x80 | (cp & 0x3f)).toByte; 4
    } else 0
  }

  @inline private def isAlnumCp(cp: Int): Boolean =
    if (cp < 0x80) (cp >= '0' && cp <= '9') || (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
    else Character.isLetterOrDigit(cp)

  /** Word ids (hash64Lower_utf8 per alnum run) of the doc's text nodes. */
  def wordIds(buf: Array[Byte], nodes: ArrayBuffer[GbXml.Node]): Array[Long] = {
    val out = new ArrayBuffer[Long](256)
    var ni = 0
    while (ni < nodes.length) {
      val nd = nodes(ni)
      if (!nd.isTag) {
        var p = nd.off
        val end = nd.off + nd.len
        while (p < end) {
          val b = buf(p) & 0xff
          val cs = utf8Size(b)
          val cp = if (b < 0x80) b else decodeUtf8(buf, p, end)
          if (isAlnumCp(cp)) {
            // scan the alnum run
            val start = p
            var q = p
            var scanning = true
            while (scanning && q < end) {
              val bb = buf(q) & 0xff
              val qs = utf8Size(bb)
              val qcp = if (bb < 0x80) bb else decodeUtf8(buf, q, end)
              if (isAlnumCp(qcp)) q += math.max(qs, 1) else scanning = false
            }
            out += hash64LowerUtf8(buf, start, q - start)
            p = q
          } else p += math.max(cs, 1)
        }
      }
      ni += 1
    }
    out.toArray
  }

  /** computeVector (XmlDoc.cpp:9543-9660) over precomputed word ids. */
  def sampleVector(wids: Array[Long]): Array[Int] = {
    val count = wids.length
    var ratio = count / MaxTerms
    var mask = 0 // unsigned byte
    while (ratio >= 4) { mask = ((mask >>> 1) | 0x80) & 0xff; ratio >>= 1 }

    var d: Array[Int] = null
    var nd = 0
    var again = true
    while (again) {
      again = false
      val seen = new java.util.HashSet[Integer]()
      d = new Array[Int](math.min(count, 3000))
      nd = 0
      var mo = 0
      var i = 0
      var break = false
      while (i < count && !break) {
        val wid = wids(i)
        if (wid != 0L) {
          // termid top byte: (wids[i] >> (NUMTERMIDBITS-8)) & mask,
          // NUMTERMIDBITS = 48 (Indexdb.h:20)
          if ((((wid >>> 40) & 0xff).toInt & mask) != 0) mo += 1
          else {
            val wid32 = Integer.valueOf(wid.toInt)
            if (!seen.contains(wid32)) {
              seen.add(wid32)
              d(nd) = wid.toInt
              nd += 1
              if (nd >= 3000) break = true // overflow cap (XmlDoc.cpp:9637-9641)
            }
          }
        }
        i += 1
      }
      // too few under the mask: relax it and redo (XmlDoc.cpp:9645-9652)
      if (nd < MaxTerms && mask != 0 && mo > 0) {
        mask = (mask << 1) & 0xff
        again = true
      }
    }
    val v = java.util.Arrays.copyOf(d, math.min(nd, MaxTerms))
    // unsigned ascending, like the reference's uint32 bubble sort
    val boxed = v.map(Integer.valueOf).sortWith((a, b) => Integer.compareUnsigned(a, b) < 0)
    boxed.map(_.intValue())
  }

  def sampleVector(buf: Array[Byte], nodes: ArrayBuffer[GbXml.Node]): Array[Int] =
    sampleVector(wordIds(buf, nodes))

  /** computeSimilarity (XmlDoc.cpp:9893-10038), scoreless/queryless:
    * 100 · 2·matches / (n0+n1). Both empty → 0; either empty → 0. */
  def similarity(v0: Array[Int], v1: Array[Int]): Float = {
    if (v0 == null || v1 == null) return 0f
    val n0 = v0.length
    val n1 = v1.length
    if (n0 == 0 || n1 == 0) return 0f
    val set = new java.util.HashSet[Integer]()
    var i = 0
    while (i < n0) { set.add(v0(i)); i += 1 }
    var matchScore = 0
    i = 0
    while (i < n1) {
      if (set.remove(v1(i))) matchScore += 2 // self score + stored score
      i += 1
    }
    100f * matchScore.toFloat / (n0 + n1).toFloat
  }
}
