# Minimal Biopython namespace shim for reference-execution parity runs
# (tools/refparity.py). Test scaffolding only -- never imported by the
# engine. See Bio/Seq.py.
