"""Structured Streaming surface (extension — SURVEY.md §2.8).

The reference's "streaming" is out-of-core chunked *batch* execution
(upscale_streaming.py:78-141, docstring :146); true event-time streaming
is an engine extension built on Structured Streaming.
"""
