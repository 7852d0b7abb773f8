"""Structured Streaming layer (Phase 3, SURVEY.md §7).

Binds the batch-proven operator semantics to `readStream`:

- source.py    — file-replay source of the `events` table (A1 analog)
- anomaly.py   — stateful spike/dip via applyInPandasWithState (F1/F2)
- pipeline.py  — watermark + single-pass multi-sink foreachBatch (F3/F4/F5/F7)
- windows_stream.py — streaming session/tumbling/hopping aggregation
                 (K1-K3 streaming forms, batch-equivalence tested)
- http_sink.py — chunked, paced HTTP row push + high-watermark commit
                 protocol (A8/A9/F6/F8/F9)
"""
