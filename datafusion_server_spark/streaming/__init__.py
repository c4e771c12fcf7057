"""Structured Streaming operators.

The reference has NO streaming computation (SURVEY §2.C: its "streaming"
is transport-only — Arrow IPC chunking of finished queries). This package
is therefore beyond-reference surface: event-time tumbling windows with
watermarks over a file stream, executed with an availableNow trigger so
results are deterministic and oracle-checkable against batch SQL.
"""
