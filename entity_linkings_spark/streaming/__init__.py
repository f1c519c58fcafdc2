"""Incremental / streaming mode (Structured Streaming).

The reference is strictly batch (SURVEY.md section 2.8: no watermarks, no
state anywhere in /root/reference); this package adds the incremental posture
a transcript firehose needs: micro-batch linkage via foreachBatch and
watermarked event-time aggregation over the mention stream."""
