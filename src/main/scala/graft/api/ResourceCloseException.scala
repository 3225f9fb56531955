package graft.api

/** Marker for a resource close() failure on an otherwise-successful
  * path (ADR-0005 row 2: close-only error surfaces). The class name
  * survives Spark's task-failure transport, which lets driver-side
  * metrics count close failures even though accumulator updates from
  * failed tasks are discarded. A close error suppressed under a primary
  * processing error is NOT separately countable (the suppressed list
  * does not survive transport) — the primary failure is what surfaces.
  */
class ResourceCloseException(cause: Throwable)
  extends RuntimeException(s"resource close failed: ${cause.getMessage}", cause)
