package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Binary pgoutput (logical replication protocol v1) message codec — the
  * wire half of the S1 source seam. Message layouts follow the PUBLIC
  * PostgreSQL logical-streaming-replication protocol documentation
  * (Begin/Commit/Relation/Insert/Update/Delete + TupleData with
  * 't'/'n'/'u' column tags); the reference consumes the same protocol via
  * pglogrepl (reference: internal/cdc/postgres/postgres.go:223-318).
  *
  * Segment framing: a replay segment is a sequence of
  * `[walStart: int64 BE][len: int32 BE][payload: len bytes]` frames — the
  * XLogData ('w' CopyData) analogue with keepalives stripped. A live
  * socket implementation feeds the same `decodeSegment` from its receive
  * loop.
  *
  * Semantics preserved from the reference (SURVEY.md §2.1):
  *  - S2 relation cache: relid → (namespace, relname, column names);
  *  - S3 tuple decode: 't' → text value, 'n' → NULL, 'u' (unchanged
  *    TOAST) → NULL — the lossy collapse the stateful repair fixes
  *    downstream;
  *  - S4 per-op mapping: insert → op "c" with After; update → op "u"
  *    with After only (any old tuple is parsed and DISCARDED); delete →
  *    op "d" with Before when REPLICA IDENTITY supplies one, else
  *    primary_key "";
  *  - S5 commit-time emission: changes buffer in the pending transaction
  *    and surface only when the Commit message stamps them with the
  *    commit LSN — no mid-transaction visibility. An uncommitted tail
  *    (segment ends before 'C') emits nothing.
  */
object PgOutputWire {

  /** One decoded, committed change (string-or-null tuple maps). */
  final case class Change(
      op: String,
      schema: String,
      table: String,
      primaryKey: String,
      before: Option[Map[String, String]],
      after: Option[Map[String, String]],
      lsn: Long)

  /** Relation-cache entry (public so a multi-segment reader can seed
    * [[decodeSegment]] with the previous segment's cache). */
  final case class Relation(
      namespace: String, name: String, cols: Array[String])

  private final case class Pending(
      op: String, relId: Int,
      before: Option[Map[String, String]],
      after: Option[Map[String, String]])

  /** Decode one framed segment into its committed changes. `idColumn`
    * resolves the per-table primary-key column (reference:
    * internal/config/config.go:61-66 mapping.id_column; default "id").
    *
    * Segment contract: a live pgoutput connection sends each Relation
    * message ONCE per session, while this replay decoder starts each
    * segment with an empty relation cache — so segment files must be
    * SELF-CONTAINED (every relId preceded by its Relation message in the
    * same file), which is how the capture path writes them. A reader
    * carrying state across segment files can seed the cache via
    * `seedRelations`; a relId with no Relation from either source fails
    * with an actionable error rather than a bare key miss. */
  def decodeSegment(bytes: Array[Byte],
                    idColumn: String => String = _ => "id",
                    seedRelations: Map[Int, Relation] = Map.empty): Seq[Change] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val relations = mutable.Map[Int, Relation]() ++= seedRelations
    def relationOf(relId: Int): Relation = relations.getOrElse(relId,
      throw new IllegalStateException(
        s"unknown relation id $relId: segment is missing its Relation " +
          "message (segments must be self-contained, or pass the prior " +
          "segment's relation cache as seedRelations)"))
    val pending = mutable.ArrayBuffer[Pending]()
    val out = mutable.ArrayBuffer[Change]()

    while (buf.remaining() >= 12) {
      buf.getLong() // walStart — positioning only; commit stamps the LSN
      val len = buf.getInt()
      val payload = new Array[Byte](len)
      buf.get(payload)
      val m = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      (m.get(): @unchecked) match {
        case 'B' => // Begin: finalLSN(8) ts(8) xid(4) — buffer stays empty
          pending.clear()
        case 'R' =>
          val relId = m.getInt()
          val ns = cstring(m)
          val name = cstring(m)
          m.get() // replica identity
          val ncols = m.getShort()
          val cols = Array.fill(ncols.toInt) {
            m.get() // per-column flags
            val c = cstring(m)
            m.getInt(); m.getInt() // type oid, atttypmod
            c
          }
          relations(relId) = Relation(if (ns.isEmpty) "pg_catalog" else ns,
            name, cols)
        case 'I' =>
          val relId = m.getInt()
          require(m.get() == 'N', "insert must carry a new tuple")
          val after = tuple(m, relationOf(relId).cols)
          pending += Pending("c", relId, None, Some(after))
        case 'U' =>
          val relId = m.getInt()
          val tag = m.get()
          if (tag == 'K' || tag == 'O') {
            tuple(m, relationOf(relId).cols) // old tuple parsed, DISCARDED
            require(m.get() == 'N', "update must carry a new tuple")
          } else require(tag == 'N', s"unexpected update tuple tag $tag")
          val after = tuple(m, relationOf(relId).cols)
          pending += Pending("u", relId, None, Some(after))
        case 'D' =>
          val relId = m.getInt()
          val tag = m.get()
          val before =
            if (tag == 'K' || tag == 'O')
              // a zero-column identity tuple is "no old tuple" — the blind
              // delete case (reference: postgres.go:602-619)
              Some(tuple(m, relationOf(relId).cols)).filter(_.nonEmpty)
            else None
          pending += Pending("d", relId, before, None)
        case 'C' => // Commit: flags(1) commitLSN(8) endLSN(8) ts(8)
          m.get()
          val commitLsn = m.getLong()
          pending.foreach { p =>
            val rel = relationOf(p.relId)
            val idCol = idColumn(s"${rel.namespace}.${rel.name}")
            val pk = p.op match {
              case "d" => p.before.flatMap(_.get(idCol)).flatMap(Option(_))
                .getOrElse("") // blind delete → "" (postgres.go:602-619)
              case _ => p.after.flatMap(_.get(idCol)).flatMap(Option(_))
                .getOrElse("")
            }
            out += Change(p.op, rel.namespace, rel.name, pk,
              p.before, p.after, commitLsn)
          }
          pending.clear()
        case _ => // Origin/Type/Truncate/Message — ignored (postgres.go:316)
      }
    }
    out.toSeq
  }

  private def cstring(b: ByteBuffer): String = {
    val bytes = mutable.ArrayBuffer[Byte]()
    var c = b.get()
    while (c != 0) { bytes += c; c = b.get() }
    new String(bytes.toArray, StandardCharsets.UTF_8)
  }

  /** TupleData → name→value map. Absent values are genuine nulls in the
    * map (key present, value null) — matching the reference's decode
    * (postgres.go:629-638): 'n' NULL and 'u' unchanged-TOAST both land as
    * null, 't' is the text representation. */
  private def tuple(b: ByteBuffer, cols: Array[String]): Map[String, String] = {
    val n = b.getShort()
    val m = Map.newBuilder[String, String]
    var i = 0
    while (i < n) {
      val tag = b.get()
      val v: String = tag match {
        case 't' =>
          val len = b.getInt()
          val bs = new Array[Byte](len)
          b.get(bs)
          new String(bs, StandardCharsets.UTF_8)
        case 'n' | 'u' => null
        case 'b' =>
          // binary representation (publication binary = true): a
          // text-mode consumer can't decode it — consume the framed
          // payload and degrade to null, like the reference's default
          // case (postgres.go parseTupleData), instead of failing the
          // partition
          val len = b.getInt()
          b.position(b.position() + len)
          null
        case _ => null // unknown tag → null (reference default case)
      }
      if (i < cols.length) m += (cols(i) -> v)
      i += 1
    }
    m.result()
  }

  // ---- frame/message writers (dev + spec fixture generation) ------------

  /** Frame a message sequence into segment bytes. */
  def frame(messages: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val size = messages.map(12 + _._2.length).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    messages.foreach { case (lsn, payload) =>
      b.putLong(lsn); b.putInt(payload.length); b.put(payload)
    }
    b.array()
  }

  def begin(finalLsn: Long, xid: Int): Array[Byte] = {
    val b = alloc(1 + 8 + 8 + 4)
    b.put('B'.toByte).putLong(finalLsn).putLong(0L).putInt(xid); b.array()
  }

  def relation(relId: Int, namespace: String, name: String,
               cols: Seq[String]): Array[Byte] = {
    val colBytes = cols.map(_.getBytes(StandardCharsets.UTF_8))
    val nsB = namespace.getBytes(StandardCharsets.UTF_8)
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    val b = alloc(1 + 4 + nsB.length + 1 + nameB.length + 1 + 1 + 2 +
      colBytes.map(_.length + 1 + 1 + 8).sum)
    b.put('R'.toByte).putInt(relId)
    b.put(nsB).put(0.toByte)
    b.put(nameB).put(0.toByte)
    b.put('d'.toByte) // replica identity default
    b.putShort(cols.size.toShort)
    colBytes.foreach { c =>
      b.put(1.toByte).put(c).put(0.toByte).putInt(25).putInt(-1) // text oid
    }
    b.array()
  }

  /** values: Some(text) → 't', None → 'n'; pass `toastMarkers` positions
    * to emit 'u' (unchanged TOAST) instead of 'n'. */
  def tupleData(values: Seq[Option[String]],
                toastMarkers: Set[Int] = Set.empty): Array[Byte] = {
    val enc = values.map(_.map(_.getBytes(StandardCharsets.UTF_8)))
    val b = alloc(2 + enc.zipWithIndex.map {
      case (Some(v), _) => 1 + 4 + v.length
      case (None, _) => 1
    }.sum)
    b.putShort(values.size.toShort)
    enc.zipWithIndex.foreach {
      case (Some(v), _) => b.put('t'.toByte).putInt(v.length).put(v)
      case (None, i) => b.put(if (toastMarkers(i)) 'u'.toByte else 'n'.toByte)
    }
    b.array()
  }

  def insert(relId: Int, newTuple: Array[Byte]): Array[Byte] = {
    val b = alloc(1 + 4 + 1 + newTuple.length)
    b.put('I'.toByte).putInt(relId).put('N'.toByte).put(newTuple); b.array()
  }

  def update(relId: Int, newTuple: Array[Byte],
             oldTuple: Option[Array[Byte]] = None): Array[Byte] = {
    val old = oldTuple.map(t => 1 + t.length).getOrElse(0)
    val b = alloc(1 + 4 + old + 1 + newTuple.length)
    b.put('U'.toByte).putInt(relId)
    oldTuple.foreach(t => b.put('O'.toByte).put(t))
    b.put('N'.toByte).put(newTuple); b.array()
  }

  def delete(relId: Int, oldTuple: Option[Array[Byte]]): Array[Byte] =
    oldTuple match {
      case Some(t) =>
        val b = alloc(1 + 4 + 1 + t.length)
        b.put('D'.toByte).putInt(relId).put('K'.toByte).put(t); b.array()
      case None =>
        // a delete with no identity tuple still carries a (empty) TupleData
        // under 'K' in real streams only when an identity exists; model the
        // no-identity case as a zero-column old tuple
        val b = alloc(1 + 4 + 1 + 2)
        b.put('D'.toByte).putInt(relId).put('K'.toByte).putShort(0.toShort)
        b.array()
    }

  def commit(commitLsn: Long): Array[Byte] = {
    val b = alloc(1 + 1 + 8 + 8 + 8)
    b.put('C'.toByte).put(0.toByte).putLong(commitLsn).putLong(commitLsn + 1)
      .putLong(0L)
    b.array()
  }

  private def alloc(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)
}
