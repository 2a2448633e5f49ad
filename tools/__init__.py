"""Repo tooling (scale controls, oracle checker, host probe).

A package so bench.py can import tools.host_probe.probe_host and
embed the host-speed datum directly into the bench record.
"""
