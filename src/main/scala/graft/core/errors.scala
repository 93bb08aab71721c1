package graft.core

/** Typed error taxonomy mirroring the reference's `ValentinusError` enum
  * (reference: src/embeddings.rs:179-209) — but as exceptions carrying
  * context, and with the silent-failure modes of the reference (unknown
  * filter op ⇒ eq, md2f.rs:32) turned into hard errors (SURVEY.md §7.4).
  */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

/** View names must match ^[a-zA-Z0-9_]+$ (reference: embeddings.rs:106-109). */
final case class InvalidViewName(name: String)
  extends GraftException(s"invalid view name '$name': must match ^[a-zA-Z0-9_]+$$")

/** View names are unique in the catalog (reference: embeddings.rs:248-267). */
final case class DuplicateView(name: String)
  extends GraftException(s"collection view '$name' already exists")

/** Lookup by view/key failed (reference panics here, embeddings.rs:437-439). */
final case class ViewNotFound(name: String)
  extends GraftException(s"collection '$name' not found")

/** Malformed metadata-filter JSON (reference: md2f.rs:79-84). */
final case class MalformedFilter(raw: String, reason: String)
  extends GraftException(s"malformed filter '$raw': $reason")

/** Unknown operator — the reference silently treats it as `eq` (md2f.rs:32);
  * we fail loudly (documented divergence, SURVEY.md §7.4). */
final case class UnknownFilterOp(op: String)
  extends GraftException(s"unknown filter operator '$op' (expected eq/gt/gte/lt/lte/in)")
