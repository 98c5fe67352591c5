"""Structured-Streaming surface.

The reference *is* a stream processor (bounded look-ahead buffer with an
eviction horizon — ``lib/markdup_sam.py:63,236-239`` — i.e. an event-time
watermark with fixed lateness). The batch pipeline is the primary engine
(the north rule is a batch pipeline with checkpoint resume); this package
carries the streaming analog of the exact-dedup pass.
"""
