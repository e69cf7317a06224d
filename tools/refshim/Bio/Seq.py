"""Minimal Bio.Seq shim so the reference ProHap/ProVar modules can run
verbatim in the sandbox (Biopython is not installed). Test scaffolding
only -- the engine never imports this.

Implements exactly the surface the reference uses
(reference/src/modules/{process_haplotypes,process_variants,
coordinates_toolbox}.py): construction from str/Seq, slicing and
concatenation returning Seq, transcribe(), reverse_complement(), and
translate() with the public NCBI standard genetic code (table 1),
'*' for stops, trailing partial codon dropped (Biopython warns and
truncates; we just truncate).
"""

_BASES = "TCAG"
# NCBI translation table 1, row-major over (base1, base2, base3) in TCAG order
_AA = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
_CODON = {}
_i = 0
for _b1 in _BASES:
    for _b2 in _BASES:
        for _b3 in _BASES:
            _CODON[_b1 + _b2 + _b3] = _AA[_i]
            _i += 1

_COMP = str.maketrans(
    "ACGTUNRYSWKMBDHVacgtunryswkmbdhv",
    "TGCAANYRSWMKVHDBtgcaanyrswmkvhdb",
)


class Seq(str):
    def __new__(cls, data=""):
        return str.__new__(cls, str(data))

    def __getitem__(self, idx):
        return Seq(str.__getitem__(self, idx))

    def __add__(self, other):
        return Seq(str(self) + str(other))

    def __radd__(self, other):
        return Seq(str(other) + str(self))

    def transcribe(self):
        return Seq(str(self).replace("T", "U").replace("t", "u"))

    def back_transcribe(self):
        return Seq(str(self).replace("U", "T").replace("u", "t"))

    def complement(self):
        return Seq(str(self).translate(_COMP))

    def reverse_complement(self):
        return Seq(str(self).translate(_COMP)[::-1])

    def translate(self, table=1, stop_symbol="*", to_stop=False):
        s = str(self).upper().replace("U", "T")
        out = []
        for i in range(0, len(s) - 2, 3):
            aa = _CODON.get(s[i : i + 3], "X")
            if aa == "*":
                if to_stop:
                    break
                out.append(stop_symbol)
            else:
                out.append(aa)
        return Seq("".join(out))
