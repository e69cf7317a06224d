#!/usr/bin/env python3
"""Generate the deterministic genomic fixture files under fixtures/.

Hand-crafted mini-genome with three transcripts exercising the reference
semantics: forward/reverse strand, multi-exon cDNA, start-codon reading
frame, UTR variants, indels/frameshift, conflicts, multi-allelic rows,
X-chromosome/PAR ploidy. The script checks internal consistency (cDNA ==
spliced exons, start codon is ATG in the cDNA) before writing.

Run once; outputs are committed. Seedless — everything is explicit.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")

CODON = {}
BASES = "TCAG"
AAS = ("FFLLSSSSYY**CC*W" "LLLLPPPPHHQQRRRR"
       "IIIMTTTTNNKKSSRR" "VVVVAAAADDEEGGGG")
for i1, b1 in enumerate(BASES):
    for i2, b2 in enumerate(BASES):
        for i3, b3 in enumerate(BASES):
            CODON[b1 + b2 + b3] = AAS[i1 * 16 + i2 * 4 + i3]

RC = str.maketrans("ACGT", "TGCA")


def revcomp(s):
    return s.translate(RC)[::-1]


def translate(s, frame=0):
    s = s[frame:]
    return "".join(CODON.get(s[i:i + 3], "X")
                   for i in range(0, len(s) - len(s) % 3, 3))


# ---- chromosome 1: transcripts T1 (forward) and T3 (forward, no start) ----
# T1 cDNA layout (70 nt): 4 nt 5'UTR | ATG GCT TCA CGA TTA TGA | 3'UTR
cdna_t1 = "GGCC" + "ATGGCTTCACGATTATGA" + "CCTTGGAACCTTGGAACCTTGGAACCTTGGAACCTTGGAACCTT"
assert len(cdna_t1) == 66, len(cdna_t1)
cdna_t1 += "GGAA"  # 70 nt
assert len(cdna_t1) == 70
assert cdna_t1[4:7] == "ATG"
assert translate(cdna_t1, 4) .startswith("MASRL*")

# T1 exons: chr1[11..40] (30 nt) + chr1[61..100] (40 nt), 1-based inclusive
# T3: single exon chr1[105..134] (30 nt), no start codon, stop codon at
#     genomic [117,119]
cdna_t3 = "TTACCGGTAAAC" + "TGA" + "GGTTACTGATTGGCC"
assert len(cdna_t3) == 30
# stop codon feature at rna pos 12..14 -> genomic 105+12=117..119
assert cdna_t3[12:15] == "TGA"

# T5: single exon chr1[141..170], NO start codon and NO stop codon
# features -> reading frame stays -1 even with force_rf: the protein DB
# must translate & annotate in all three frames (rf=-1 chaining)
cdna_t5 = "CCGTACGGTTAACCGGTTAACCGGTTAACC"
assert len(cdna_t5) == 30

chr1 = ["A"] * 180
chr1[10:40] = list(cdna_t1[:30])     # genomic 11..40
chr1[60:100] = list(cdna_t1[30:70])  # genomic 61..100
chr1[104:134] = list(cdna_t3)        # genomic 105..134
chr1[140:170] = list(cdna_t5)        # genomic 141..170
chr1 = "".join(chr1)

# ---- chromosome X: transcript T2 (reverse strand) + PAR boundaries ------
# T2 exons: chrX[21..50] + chrX[71..90]; strand '-'
# cDNA = revcomp(chrX[21..50] + chrX[71..90]), length 50
# choose cDNA, then derive the genomic exon sequence
cdna_t2 = ("GA" + "ATGCCTAAAGGGTTTTGA" + "CCTTGGAACCTTGGAACCTTGGAACCTTGG")
assert len(cdna_t2) == 50
assert cdna_t2[2:5] == "ATG"
assert translate(cdna_t2, 2).startswith("MPKGF*")
genomic_t2 = revcomp(cdna_t2)  # chrX[21..50] ++ chrX[71..90]

chrX = ["A"] * 120
chrX[20:50] = list(genomic_t2[:30])
chrX[70:90] = list(genomic_t2[30:50])
chrX = "".join(chrX)

# start codon of T2 in genomic coords: cDNA pos 2..4 maps to genomic
# reverse: cdna index i <-> genomic coordinate of revcomp position.
# cDNA = revcomp(G) where G = chrX[21..90 spliced]; cdna index i ->
# spliced index (50-1-i); spliced index s -> genomic: s<30 -> 21+s,
# else 71+(s-30). cDNA 2,3,4 -> spliced 47,46,45 -> genomic 71+17=88,87,86
# => start_codon genomic span [86,88] strand '-'
assert revcomp(chrX[85:88]) == "ATG"

# PAR regions on X for fixtures: PAR1 = [1,15], PAR2 = [100,120]
PAR1_TO = 15
PAR2_FROM = 100

os.makedirs(OUT, exist_ok=True)

with open(os.path.join(OUT, "genome.txt"), "w") as f:
    f.write("1\t" + chr1 + "\n")
    f.write("X\t" + chrX + "\n")

# ---- GTF ----------------------------------------------------------------
gtf_rows = [
    # T1 forward, protein_coding
    ("1", "test", "transcript", 11, 100, ".", "+", ".",
     'gene_id "G1"; transcript_id "T1"; transcript_biotype "protein_coding";'),
    ("1", "test", "exon", 11, 40, ".", "+", ".",
     'gene_id "G1"; transcript_id "T1"; exon_number "1";'),
    ("1", "test", "exon", 61, 100, ".", "+", ".",
     'gene_id "G1"; transcript_id "T1"; exon_number "2";'),
    # start codon: cDNA pos 4..6 -> genomic 15..17
    ("1", "test", "start_codon", 15, 17, ".", "+", ".",
     'gene_id "G1"; transcript_id "T1";'),
    # stop codon TGA: cDNA 19..21 -> genomic 30..32
    ("1", "test", "stop_codon", 30, 32, ".", "+", ".",
     'gene_id "G1"; transcript_id "T1";'),
    # T3 forward, processed_transcript: no start codon, has stop codon
    ("1", "test", "transcript", 105, 134, ".", "+", ".",
     'gene_id "G3"; transcript_id "T3"; transcript_biotype "processed_transcript";'),
    ("1", "test", "exon", 105, 134, ".", "+", ".",
     'gene_id "G3"; transcript_id "T3"; exon_number "1";'),
    ("1", "test", "stop_codon", 117, 119, ".", "+", ".",
     'gene_id "G3"; transcript_id "T3";'),
    # T5 forward, no start/stop codon annotation -> rf stays unknown (-1)
    ("1", "test", "transcript", 141, 170, ".", "+", ".",
     'gene_id "G5"; transcript_id "T5"; transcript_biotype "processed_transcript";'),
    ("1", "test", "exon", 141, 170, ".", "+", ".",
     'gene_id "G5"; transcript_id "T5"; exon_number "1";'),
    # T2 reverse on X, protein_coding
    ("X", "test", "transcript", 21, 90, ".", "-", ".",
     'gene_id "G2"; transcript_id "T2"; transcript_biotype "protein_coding";'),
    ("X", "test", "exon", 21, 50, ".", "-", ".",
     'gene_id "G2"; transcript_id "T2"; exon_number "2";'),
    ("X", "test", "exon", 71, 90, ".", "-", ".",
     'gene_id "G2"; transcript_id "T2"; exon_number "1";'),
    ("X", "test", "start_codon", 86, 88, ".", "-", ".",
     'gene_id "G2"; transcript_id "T2";'),
    # T4: X transcript fully inside PAR2 -> autosomal ploidy
    ("X", "test", "transcript", 101, 118, ".", "+", ".",
     'gene_id "G4"; transcript_id "T4"; transcript_biotype "protein_coding";'),
    ("X", "test", "exon", 101, 118, ".", "+", ".",
     'gene_id "G4"; transcript_id "T4"; exon_number "1";'),
]
with open(os.path.join(OUT, "annotations.gtf"), "w") as f:
    f.write("#!genome-build fixture-1\n")
    for r in gtf_rows:
        f.write("\t".join(str(x) for x in r) + "\n")

# ---- cDNA FASTA ---------------------------------------------------------
with open(os.path.join(OUT, "cdna.fasta"), "w") as f:
    # multi-line sequences on purpose (wrap at 30)
    for tid, seq in [("T1", cdna_t1), ("T2", cdna_t2), ("T3", cdna_t3),
                     ("T5", cdna_t5)]:
        f.write(f">{tid} cdna chromosome:fixture\n")
        for i in range(0, len(seq), 30):
            f.write(seq[i:i + 30] + "\n")

# ---- protein FASTA (header grammar variants) ----------------------------
with open(os.path.join(OUT, "proteins.fasta"), "w") as f:
    f.write(">sp|P001|Protein one OS=Fixture\nMASRLLKPEWTTIR\n")
    f.write(">generic_cont|CONT1|keratin fragment\nMKRLLPGG\n")
    f.write(">enshap|H001|matching_proteins:T1 start:0\nMASRLLKPEWTTIR\n")
    f.write(">P999 unpiped description here\nMPKGFLLTQW\n")
    f.write(">generic_var|V001|\nMASRLTT\n")
    # stop-split cases: 5'UTR stop + main + 3'UTR, and a trailing stop
    f.write(">generic_enshap|H002|matching_proteins:T2 start:3 reading_frame:1\nML*MPKGF*TTW\n")
    f.write(">generic_var|V002|start:0\nMKT*\n")

# ---- VCF ----------------------------------------------------------------
# samples: S1,S2 female; S3,S4 male (matters on chrX outside PAR)
vcf_header = [
    "##fileformat=VCFv4.2",
    "##INFO=<ID=AF,Number=A,Type=Float,Description=\"Allele Frequency\">",
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\tS4\tS5\tS6",
]
# chr1 variants (T1: exons 11-40, 61-100; cDNA given above)
# rs1: SNP exon1 coding GCT->GGT (genomic 19, cDNA 8, C>G), SAV A2G
# rs2: SNP exon2 (genomic 66, cDNA 35) 3'UTR after stop
# rs3: SNP 5'UTR (genomic 12, cDNA 1)
# rs4: insertion frameshift (genomic 23, cDNA 12: G>GA)
# rs5: multi-allelic at genomic 31 (cDNA 20) A>G,T with AF list
# rs6: invalid symbolic allele (dropped by normalize)
# rs7: SNP adjacent to rs1 (genomic 20) -> conflicts with rs1 when phased
#      together (S2 copy 1 carries both)
# rs8/rs9: chrX variants inside T2 exons (genomic 30: cDNA?; genomic 75)
# rs10: chrX variant in PAR2 T4 (genomic 110)
def c1(pos):
    return chr1[pos - 1]
def cX(pos):
    return chrX[pos - 1]

# rs11: SNP in T5 (no start/stop codon) -> exercises rf=-1 three-frame
#       annotation (frame0 stop_lost / frame1 synonymous / frame2
#       stop_gained by construction)
# rs12: junction-crossing replacement in T1 3'UTR: REF spans the end of
#       exon 1 (39..40), the whole intron (41..60) and the start of exon 2
#       (61..62); the engine must reassemble the allele across the
#       junction (coordinates_toolbox.py "reach into the next exon")
rs12_ref = chr1[38:62]  # genomic 39..62 inclusive, 24 nt
assert len(rs12_ref) == 24
assert cdna_t1[28:32] == "AACC"  # spliced REF after junction reassembly
assert cdna_t5[9] == "T"

# rs13: SNP exon1 coding CGA->GGA (genomic 24, cDNA 13, C>G), SAV R3G.
#       Carried ONLY by the new sample S6 copy1 together with rs1, so the
#       haplotype {rs1,rs13} translates to MGSGL: a peptide covering both
#       SAVs reverts to the canonical MASRL -> the peptide-annotation
#       'multi-variant' class (peptides_annotate_variation.py:455).
#       S6 is the only member of YRI/AFR so every existing per-population
#       frequency string keeps its numerators AND denominators.
vcf_rows = [
    ("1", 19, "rs1", c1(19), "G", ".", "PASS", "AF=0.25",
     "GT", "1|0", "1|0", "0|1", "0|0", "1|0", "1|0"),
    ("1", 66, "rs2", c1(66), "A", ".", "PASS", "AF=0.50",
     "GT", "0|1", "0|0", "1|1", "0|0", "0|0", "0|0"),
    ("1", 12, "rs3", c1(12), "T", ".", "PASS", "AF=0.10",
     "GT", "0|0", "0|1", "0|0", "1|0", "0|0", "0|0"),
    ("1", 23, "rs4", c1(23), c1(23) + "A", ".", "PASS", "AF=0.05",
     "GT", "0|0", "0|0", "0|1", "0|0", "0|0", "0|0"),
    ("1", 24, "rs13", c1(24), "G", ".", "PASS", "AF=0.08",
     "GT", "0|0", "0|0", "0|0", "0|0", "0|0", "1|0"),
    ("1", 31, "rs5", c1(31), "A,T", ".", "PASS", "AF=0.15,0.01",
     "GT", "0|2", "0|0", "0|0", "2|1", "0|0", "0|0"),
    ("1", 39, "rs12", rs12_ref, "TT", ".", "PASS", "AF=0.11",
     "GT", "0|0", "0|0", "0|0", "0|0", "1|0", "0|0"),
    ("1", 50, "rs6", c1(50), "<DEL>", ".", "PASS", "AF=0.30",
     "GT", "0|0", "0|1", "0|0", "0|0", "0|0", "0|0"),
    ("1", 20, "rs7", c1(20), "A", ".", "PASS", "AF=0.02",
     "GT", "0|0", "1|0", "0|0", "0|0", "0|0", "0|0"),
    ("1", 150, "rs11", c1(150), "G", ".", "PASS", "AF=0.22",
     "GT", "0|0", "0|1", "0|0", "1|0", "0|0", "0|0"),
    ("X", 30, "rs8", cX(30), "C" if cX(30) != "C" else "G", ".", "PASS",
     "AF=0.20", "GT", "1|0", "0|0", "1|0", "0|0", "0|0", "0|0"),
    ("X", 75, "rs9", cX(75), "T" if cX(75) != "T" else "A", ".", "PASS",
     "AF=0.40", "GT", "0|1", "1|0", "0", "1", "0|0", "0|0"),
    ("X", 110, "rs10", cX(110), "G" if cX(110) != "G" else "C", ".", "PASS",
     "AF=0.33", "GT", "0|1", "0|0", "1|0", "0|1", "0|0", "0|0"),
]
assert c1(150) == "T"
assert c1(24) == "C"  # rs13 REF
assert cdna_t1[13:16] == "CGA" and CODON["GGA"] == "G"  # R3G after C>G
with open(os.path.join(OUT, "sample.vcf"), "w") as f:
    f.write("\n".join(vcf_header) + "\n")
    for r in vcf_rows:
        f.write("\t".join(str(x) for x in r) + "\n")

# ---- sample metadata ----------------------------------------------------
with open(os.path.join(OUT, "samples.tsv"), "w") as f:
    f.write("sample\tsex\tpopulation\tsuperpopulation\n")
    f.write("S1\tfemale\tGBR\tEUR\n")
    f.write("S2\tfemale\tFIN\tEUR\n")
    f.write("S3\tmale\tGBR\tEUR\n")
    f.write("S4\tmale\tCHB\tEAS\n")
    f.write("S5\tfemale\tFIN\tEUR\n")
    f.write("S6\tfemale\tYRI\tAFR\n")

# ---- peptides -----------------------------------------------------------
with open(os.path.join(OUT, "peptides.tsv"), "w") as f:
    f.write("pepId\tpeptide\n")
    f.write("p1\tMASRL\n")       # prefix of P001/H001
    f.write("p2\tLKPEW\n")       # internal
    f.write("p3\tKRLLP\n")       # in CONT1
    f.write("p4\tNOTFOUND\n")    # no match
    f.write("p5\tTT\n")          # shorter than k -> dropped
    f.write("p6\tMGSR\n")        # covers the rs1 SAV in haplo T1
    f.write("p7\tPKGY\n")        # covers the rs9 SAV in haplo T2
    # peptide-annotation classification cases
    # (peptides_annotate_variation.py:453-466):
    f.write("p8\tLGTLE\n")       # no alt covered; spans the 10:G REF allele
    #                              of rs2 in the rs5 haplotype at match
    #                              pos 9 -> canonical-no-ref + ref-allele hit
    f.write("p9\tLPWNLE\n")      # covers 5:*>5:L AND 10:G>10:E but the
    #                              reverted peptide crosses the canonical
    #                              stop -> variant-no-ref
    f.write("p10\tTIMTL\n")      # downstream of the rs4 (+fs) in MGSTIMTLEP
    #                              -> frameshift class, preceding indel +1
    f.write("p11\tYGEPV\n")      # T5 rf=-1 FRAME 0 entry only; covers the
    #                              frame-0 component 3:*>3:E of the
    #                              '|'-chained change list
    f.write("p12\tGFLLT\n")      # only inside P999 (no metadata) -> the
    #                              manual-entry path: single-variant(ProVar)
    f.write("p13\tMGSGL\n")      # covers rs1 (1:A>1:G) + rs13 (3:R>3:G);
    #                              reverts to canonical MASRL -> multi-variant

# ---- reference proteome keyed by transcript (check_canonical_peptide, ----
# ---- peptides_annotate_variation.py:172-190) -----------------------------
# The reference pipeline feeds peptide annotation an ENST-keyed reference
# translation FASTA (fix_headers.py use_ENST). Fixture equivalent: the
# canonical translations of the coding fixture transcripts, derived from
# the same cDNA definitions used above (stop-codon truncated).
refprot_t1 = translate(cdna_t1, 4).split("*")[0]
refprot_t2 = translate(cdna_t2, 2).split("*")[0]
assert refprot_t1 == "MASRL" and refprot_t2 == "MPKGF"
with open(os.path.join(OUT, "refprot.fasta"), "w") as f:
    f.write(">T1 reference translation\n%s\n" % refprot_t1)
    f.write(">T2 reference translation\n%s\n" % refprot_t2)

print("fixtures written to", os.path.abspath(OUT))
print("PAR1_TO", PAR1_TO, "PAR2_FROM", PAR2_FROM)
print("chr1", chr1)
print("chrX", chrX)

# ---- CSV for the csv_to_vcf projection ----------------------------------
with open(os.path.join(OUT, "variants.csv"), "w") as f:
    f.write("accession,chrom,pos,ref,alt,note\n")
    f.write("varB,2,500,T,G,second\n")
    f.write("varA,1,100,A,C,first\n")
    f.write("varC,1,50,G,GA,third\n")

# ---- Ensembl-style reference proteome + annotation (get_reference_ENST,
# ---- fix_headers use_ENST) ----------------------------------------------
# Header shapes: Ensembl pep (unpiped, 'transcript:ENSTxx.v' +
# 'chromosome:BUILD:CHR:...'), a scaffold entry using the bare 'GRChNN:CHR:'
# form, one with no chromosome info at all, and one piped sp-style entry
# whose description carries the ENST (the use_ENST promotion path for
# formatted headers).
with open(os.path.join(OUT, "ensref.fasta"), "w") as f:
    f.write(">ENSP01.1 pep chromosome:GRCh38:1:11:100:1 gene:ENSG01.2 "
            "transcript:ENST01.3 gene_symbol:GA\nMASRL\n")
    f.write(">ENSP02.2 pep chromosome:GRCh38:2:5:50:-1 gene:ENSG01.2 "
            "transcript:ENST02.1\nMPKGY\n")
    f.write(">ENSP03.1 pep scaffold GRCh38:X:1:99:1 gene:ENSG02.1 "
            "transcript:ENST03.1\nMKRLL\n")
    f.write(">ENSP04.1 pep transcript:ENST04.2 gene:ENSG03.1\nMASTT\n")
    f.write(">sp|P100|Reference protein transcript:ENST01.3 OS=Fixture\n"
            "MASRL\n")

# tag is a REPEATED GTF attribute (multiple 'tag "..."' per line), so the
# fixture exercises containment matching rather than first-value extraction
ensref_gtf_rows = [
    ("1", "ens", "transcript", 11, 100, ".", "+", ".",
     'gene_id "ENSG01"; transcript_id "ENST01"; tag "basic"; '
     'tag "MANE_Select";'),
    ("2", "ens", "transcript", 5, 50, ".", "-", ".",
     'gene_id "ENSG01"; transcript_id "ENST02"; tag "basic"; '
     'tag "Ensembl_canonical";'),
    ("X", "ens", "transcript", 1, 99, ".", "+", ".",
     'gene_id "ENSG02"; transcript_id "ENST03"; tag "Ensembl_canonical";'),
    ("3", "ens", "transcript", 1, 60, ".", "+", ".",
     'gene_id "ENSG03"; transcript_id "ENST04"; tag "basic";'),
]
with open(os.path.join(OUT, "ensref.gtf"), "w") as f:
    f.write("#!genome-build fixture-ens\n")
    for r in ensref_gtf_rows:
        f.write("\t".join(str(x) for x in r) + "\n")

# ---- post-processing FASTA (merge_duplicate_seq-style headers) ----------
with open(os.path.join(OUT, "postproc.fasta"), "w") as f:
    f.write(">generic_enshap|prot_1|position_within_protein:0;0 "
            "start:0;3 matching_proteins:haplo_a,haplo_b;haplo_c "
            "reading_frame:1,1;2 split_sequences:acc1;acc2_5UTR_0\n")
    f.write("MASRLLK\n")
    f.write(">generic_var|prot_2|position_within_protein:4 start:0 "
            "matching_proteins:var_T1_a reading_frame:0 "
            "split_sequences:acc3_3UTR_1\n")
    f.write("MPKW\n")
    f.write(">generic_ensref|prot_3|position_within_protein:0 start:0 "
            "matching_proteins:T3 reading_frame:- split_sequences:acc4\n")
    f.write("LPVN\n")
    f.write(">generic_cont|prot_4|position_within_protein:0 start:0 "
            "matching_proteins:KERATIN1 reading_frame:- "
            "split_sequences:acc5\n")
    f.write("MKRLL\n")

# ---- WARC crawl fixture (src_warc: Common Crawl-style ingestion) --------
# ISO 28500 WARC/1.0 records: warcinfo, request, html/plain/404 responses,
# a record with trailing junk past Content-Length (payload must be
# TRIMMED), a truncated record (Content-Length overstates the body), and
# a revisit record. One response body contains "WARC/1.0" mid-line and
# bare \r\n\r\n sequences to exercise the record splitter.


def warc_record(headers, payload, content_length=None):
    cl = len(payload.encode()) if content_length is None else content_length
    hdr = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (f"WARC/1.0\r\n{hdr}Content-Length: {cl}\r\n\r\n"
            f"{payload}\r\n\r\n")


HTML_BODY = (
    "<html><head><title>Example Domain</title>\n"
    "<style>body { margin: 0; }</style>\n"
    "<script>var x = 1 < 2;</script>\n"
    "</head>\n<body>\n"
    "<h1>Example &amp; Friends</h1>\n"
    # outlink zoo for w3: double/single-quoted, unquoted, uppercase HREF
    # with extra attributes, fragment-only (excluded), href-less anchor
    '<p><a href="http://example.com/about">About</a> and\n'
    "<a href='/relative/path'>a relative link</a> and\n"
    "<a href=/unquoted>unquoted</a>.</p>\n"
    '<p><A CLASS="nav" HREF="https://other.example.org/x?b=2&a=1">caps'
    '</A> <a href="#toc">fragment only</a>\n'
    # frontier-politeness zoo for w7: a link into a robots-Disallowed
    # prefix (must be dropped from the frontier) and one the longer
    # Allow: /private/ok override re-admits
    '<a href="/private/secret">blocked by robots</a>\n'
    '<a href="/private/okpage">allow-override</a>\n'
    "<a name='no-href'>no href here</a></p>\n"
    "<p>First paragraph with <b>bold</b> text.</p>\n\n"
    "<p>Second one mentions WARC/1.0 mid-line &lt;here&gt;.</p>\n"
    "</body></html>\n")
HTTP_HTML = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
             "Server: demo\r\n\r\n" + HTML_BODY)
HTTP_PLAIN = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
              # real robots directives for w4: a wildcard stanza with a
              # longer Allow overriding a Disallow prefix, a comment, a
              # blank separator, and an agent-specific stanza that must
              # take precedence for that agent
              "User-agent: *\n"
              "Disallow: /private/\n"
              "Disallow: /tmp\n"
              "Allow: /private/ok\n"
              "# temporary block\n"
              "\n"
              "User-agent: evilbot\n"
              "Disallow: /\n")
HTTP_404 = ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"
            "<html><body><p>Missing &#39;page&#39;."
            "<a href=\"http://dead.example.com/\">dead link</a>"
            "</p></body></html>")
HTTP_JUNK = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
             "<html><body><p>Short &quot;quoted&quot; page.</p>"
             "</body></html>")
HTTP_TRUNC = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              "<html><body><p>Cut off mid")

warc_records = [
    warc_record([("WARC-Type", "warcinfo"),
                 ("WARC-Record-ID", "<urn:uuid:0001>"),
                 ("WARC-Date", "2024-05-01T12:00:00Z"),
                 ("Content-Type", "application/warc-fields")],
                "software: graft-fixture 1.0\r\n"
                "format: WARC File Format 1.1\r\n"),
    warc_record([("WARC-Type", "request"),
                 ("WARC-Record-ID", "<urn:uuid:0002>"),
                 ("WARC-Date", "2024-05-01T12:00:01Z"),
                 ("WARC-Target-URI", "http://example.com/"),
                 ("WARC-IP-Address", "93.184.216.34"),
                 ("Content-Type", "application/http; msgtype=request")],
                "GET / HTTP/1.1\r\nHost: example.com\r\n"
                "User-Agent: graft\r\n\r\n"),
    warc_record([("WARC-Type", "response"),
                 ("WARC-Record-ID", "<urn:uuid:0003>"),
                 ("WARC-Date", "2024-05-01T12:00:01Z"),
                 ("WARC-Target-URI", "http://example.com/"),
                 ("Content-Type", "application/http; msgtype=response")],
                HTTP_HTML),
    warc_record([("WARC-Type", "response"),
                 ("WARC-Record-ID", "<urn:uuid:0004>"),
                 ("WARC-Date", "2024-05-01T12:00:02Z"),
                 ("WARC-Target-URI", "http://example.com/robots.txt"),
                 ("Content-Type", "application/http; msgtype=response")],
                HTTP_PLAIN),
    warc_record([("WARC-Type", "response"),
                 ("WARC-Record-ID", "<urn:uuid:0005>"),
                 ("WARC-Date", "2024-05-01T12:00:03Z"),
                 ("WARC-Target-URI", "http://example.com/gone"),
                 ("Content-Type", "application/http; msgtype=response")],
                HTTP_404),
    # trailing junk past Content-Length: reader must trim the payload
    warc_record([("WARC-Type", "response"),
                 ("WARC-Record-ID", "<urn:uuid:0006>"),
                 ("WARC-Date", "2024-05-01T12:00:04Z"),
                 ("WARC-Target-URI", "http://example.com/junk"),
                 ("Content-Type", "application/http; msgtype=response")],
                HTTP_JUNK + "IGNORED-TRAILER",
                content_length=len(HTTP_JUNK.encode())),
    # truncated capture: Content-Length overstates what was written
    warc_record([("WARC-Type", "response"),
                 ("WARC-Record-ID", "<urn:uuid:0007>"),
                 ("WARC-Date", "2024-05-01T12:00:05Z"),
                 ("WARC-Target-URI", "http://example.com/cut"),
                 ("Content-Type", "application/http; msgtype=response")],
                HTTP_TRUNC, content_length=1000),
    warc_record([("WARC-Type", "revisit"),
                 ("WARC-Record-ID", "<urn:uuid:0008>"),
                 ("WARC-Date", "2024-05-01T12:00:06Z"),
                 ("WARC-Target-URI", "http://example.com/"),
                 ("WARC-Refers-To", "<urn:uuid:0003>"),
                 ("WARC-Profile",
                  "http://netpreserve.org/warc/1.0/revisit/identical"
                  "-payload-digest")],
                ""),
]
with open(os.path.join(OUT, "crawl.warc"), "w", newline="") as f:
    f.write("".join(warc_records))

# ---- perceptual-hash PNG fixtures (m6_phash_dedup) ----------------------
# A gradient image, a lightly-edited copy (near-dup: few dHash bits), the
# SAME gradient at 2x resolution (dHash is scale-invariant through the 9x8
# grid), and an unrelated high-frequency pattern. Grayscale 8-bit PNGs
# written by hand (zlib + struct) so the fixture stays dependency-free.
import struct
import zlib


def _png_chunk(typ, data):
    out = struct.pack(">I", len(data)) + typ + data
    return out + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)


def write_png_gray(path, rows):
    h, w = len(rows), len(rows[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_png_chunk(b"IHDR", ihdr))
        f.write(_png_chunk(b"IDAT", zlib.compress(raw)))
        f.write(_png_chunk(b"IEND", b""))


PHASH_DIR = os.path.join(OUT, "png_phash")
os.makedirs(PHASH_DIR, exist_ok=True)


def grad(x, y):
    return (x * 13 + y * 7) % 256


write_png_gray(os.path.join(PHASH_DIR, "grad_16x16.png"),
               [[grad(x, y) for x in range(16)] for y in range(16)])
# near-dup: a small dark patch INVERTS a few local gradients (flips a
# handful of dHash bits — a same-order brightness shift would flip none)
write_png_gray(os.path.join(PHASH_DIR, "grad_tweak_16x16.png"),
               [[(0 if 7 <= x <= 8 and y <= 3 else grad(x, y))
                 for x in range(16)] for y in range(16)])
# the same gradient FIELD at 2x resolution (sample the same continuous
# ramp, so the 9x8 grid means land near the originals)
write_png_gray(os.path.join(PHASH_DIR, "grad_32x32.png"),
               [[grad(x // 2, y // 2) for x in range(32)]
                for y in range(32)])
# unrelated high-frequency pattern
write_png_gray(os.path.join(PHASH_DIR, "noise_16x16.png"),
               [[(x * 97 + y * 31) % 251 for x in range(16)]
                for y in range(16)])

# ---- UCSC chain file (src_chain / g6_liftover) --------------------------
# Three chains against the fixture genome (chrom 1 len 180, X len 120):
#   A: 1 -> 1_new, + strand, 3 blocks with t/q gaps (score 1000)
#   B: X -> X_new, - strand, single block (score 800)
#   C: 1 -> 1_alt, + strand, overlaps A's first block at a LOWER
#      score (500) — exercises best-chain (max score) resolution
# Block arithmetic: sum(size+dt) == tEnd-tStart, sum(size+dq) == qEnd-qStart.
with open(os.path.join(OUT, "lift.chain"), "w") as f:
    f.write("chain 1000 1 180 + 10 110 1_new 200 + 20 130 1\n")
    f.write("30 10 15\n")
    f.write("20 5 10\n")
    f.write("35\n")
    f.write("\n")
    f.write("chain 800 X 120 + 20 60 X_new 100 - 10 50 2\n")
    f.write("40\n")
    f.write("\n")
    f.write("chain 500 1 180 + 10 40 1_alt 50 + 0 30 3\n")
    f.write("30\n")
    f.write("\n")

# ---- SAM alignment fixture (src_sam) ------------------------------------
# Header + 8 alignment rows against the fixture genome: forward/reverse
# flags, soft-clips, deletions/insertions/introns in CIGAR (ref span must
# count M/D/N/=/X only), an unmapped read (*, pos 0), a secondary
# alignment, a duplicate, and optional TAG:TYPE:VALUE fields.
sam_rows = [
    "@HD\tVN:1.6\tSO:coordinate",
    "@SQ\tSN:1\tLN:180",
    "@SQ\tSN:X\tLN:120",
    "@PG\tID:graft\tPN:graft",
    # 30M: plain forward read, NM tag
    "r1\t0\t1\t11\t60\t30M\t*\t0\t0\t" + "A" * 30 + "\t" + "I" * 30 +
    "\tNM:i:0\tMD:Z:30",
    # reverse strand (16), 10M5D10M: spans 25 ref bases
    "r2\t16\t1\t61\t50\t10M5D10M\t*\t0\t0\t" + "C" * 20 + "\t" + "I" * 20 +
    "\tNM:i:5",
    # soft clips + insertion: 5S10M2I8M3S -> ref span 18
    "r3\t0\t1\t105\t40\t5S10M2I8M3S\t*\t0\t0\t" + "G" * 28 + "\t" +
    "I" * 28,
    # spliced (intron N): 8M20N7M -> ref span 35
    "r4\t0\t1\t141\t30\t8M20N7M\t*\t0\t0\t" + "T" * 15 + "\t" + "I" * 15,
    # paired, proper pair, first in pair (1+2+64=67), mate on X
    "r5\t67\tX\t21\t60\t15M\t=\t71\t65\t" + "A" * 15 + "\t" + "I" * 15,
    # secondary alignment (256) + reverse (16) = 272
    "r6\t272\tX\t71\t0\t12M\t*\t0\t0\t*\t*",
    # PCR duplicate (1024) + paired (1)
    "r7\t1025\t1\t30\t20\t6M1I6M\t*\t0\t0\t" + "A" * 13 + "\t" + "I" * 13,
    # unmapped (4): no coordinates, '*' fields
    "r8\t4\t*\t0\t0\t*\t*\t0\t0\t" + "N" * 10 + "\t" + "#" * 10,
    # overlaps r1 ([11,40] vs [25,44]) so read pileup has a depth-2 run
    "r9\t0\t1\t25\t55\t20M\t*\t0\t0\t" + "A" * 20 + "\t" + "I" * 20,
]
with open(os.path.join(OUT, "aligned.sam"), "w") as f:
    f.write("\n".join(sam_rows) + "\n")

# FASTQ reads: 4-line records with NO per-record sync marker — quality
# lines legally start with '@' (Phred+33 Q31) or '+', which is exactly
# what breaks naive "\n@" record splitting. r2 and r3 exercise those
# traps; r2's '+' line carries the optional repeated description.
fastq_rows = [
    ("r1 len=30", "ACGTACGTACGTACGTACGTACGTACGTAC", "+",
     "IIIIIIIIIIIIIIIIIIIIIIIIIIIIII"),
    ("r2", "GGGGCCCCAAAATTTT", "+r2", "@ABCDEFGHIJKLMNO"),
    ("r3 sample=x", "ACGTNNACGT", "+", "+IIIIIIII@"),
    ("r4", "A", "+", "!"),
]
with open(os.path.join(OUT, "reads.fastq"), "w") as f:
    for h, s, p, q in fastq_rows:
        f.write("@%s\n%s\n%s\n%s\n" % (h, s, p, q))

# ---- markdup SAM fixture (sam2_markdup) ---------------------------------
# Duplicate-marking needs reads that SHARE unclipped-5' signatures:
# soft-clip-shifted forward starts, reverse-strand reads whose duplicate
# key is the unclipped END, and full pairs whose BOTH ends must match.
# Quality sums decide the kept read; qname breaks ties.
dup_rows = [
    "@HD\tVN:1.6\tSO:coordinate",
    "@SQ\tSN:1\tLN:180",
    "@SQ\tSN:X\tLN:120",
    # -- forward single-end group A: unclipped 5' = 25 on chrom 1 --------
    # s1: plain 20M at 25, qual I (phred 40) x20 = 800 -> kept
    "s1\t0\t1\t25\t60\t20M\t*\t0\t0\t" + "A" * 20 + "\t" + "I" * 20,
    # s2: same span, qual 5 (phred 20) x20 = 400 -> duplicate
    "s2\t0\t1\t25\t60\t20M\t*\t0\t0\t" + "A" * 20 + "\t" + "5" * 20,
    # s3: 2S18M at 27 -> unclipped 5' = 27 - 2 = 25, qual A (32) x20 =
    # 640 -> duplicate (the soft-clip case naive pos-grouping misses)
    "s3\t0\t1\t27\t60\t2S18M\t*\t0\t0\t" + "A" * 20 + "\t" + "A" * 20,
    # -- reverse single-end group B: unclipped END = 59 on chrom 1 -------
    # s4: 10M at 50 reverse -> end 59, qual I x10 = 400 -> kept
    "s4\t16\t1\t50\t60\t10M\t*\t0\t0\t" + "C" * 10 + "\t" + "I" * 10,
    # s5: 2S8M at 52 reverse -> end 52+8-1 = 59 (leading clip is
    # read-3' on reverse strand: does NOT move the key), 200 -> dup
    "s5\t16\t1\t52\t60\t2S8M\t*\t0\t0\t" + "C" * 10 + "\t" + "5" * 10,
    # s6: 6M2S at 52 reverse -> end 57 + trailing clip 2 = 59, 256 -> dup
    "s6\t16\t1\t52\t60\t6M2S\t*\t0\t0\t" + "C" * 8 + "\t" + "A" * 8,
    # -- pair group C: both-end signature (1:100:+, 1:139:-) -------------
    # p1: qual I on both mates (sum 1600) -> kept
    "p1\t99\t1\t100\t60\t10M\t=\t130\t40\t" + "G" * 10 + "\t" + "I" * 10,
    "p1\t147\t1\t130\t60\t10M\t=\t100\t-40\t" + "G" * 10 + "\t" + "I" * 10,
    # p2: same two 5' keys, qual 5 (sum 800) -> both mates duplicates
    "p2\t99\t1\t100\t60\t10M\t=\t130\t40\t" + "G" * 10 + "\t" + "5" * 10,
    "p2\t147\t1\t130\t60\t10M\t=\t100\t-40\t" + "G" * 10 + "\t" + "5" * 10,
    # p3: same forward key but mate at 140 -> different pair signature,
    # NOT a duplicate of p1/p2 despite sharing one end
    "p3\t99\t1\t100\t60\t10M\t=\t140\t50\t" + "G" * 10 + "\t" + "I" * 10,
    "p3\t147\t1\t140\t60\t10M\t=\t100\t-50\t" + "G" * 10 + "\t" + "I" * 10,
    # -- controls --------------------------------------------------------
    # u1: unique position, group of one -> kept
    "u1\t0\tX\t5\t60\t5M\t*\t0\t0\t" + "T" * 5 + "\t" + "I" * 5,
    # um1: unmapped -> ineligible, reported unmarked
    "um1\t4\t*\t0\t0\t*\t*\t0\t0\t" + "N" * 6 + "\t" + "#" * 6,
    # sec1: secondary of s2's template -> inherits s2's duplicate verdict
    "sec1\t256\tX\t90\t0\t5M\t*\t0\t0\t*\t*",
]
# sec1 shares qname with s2 via the qname field below: rename line
dup_rows = [r if not r.startswith("sec1") else
            "s2\t256\tX\t90\t0\t5M\t*\t0\t0\t*\t*" for r in dup_rows]
with open(os.path.join(OUT, "dupreads.sam"), "w") as f:
    f.write("\n".join(dup_rows) + "\n")

# ---- sitemap fixture (src_sitemap) --------------------------------------
# One urlset sitemap with the fields a crawler schedules on: loc
# (entity-encoded ampersand, surrounding whitespace), optional lastmod /
# changefreq / priority in every combination, a multi-line <url> block
# and a single-line one.
sitemap = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://example.com/</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>1.0</priority>
  </url>
  <url>
    <loc> http://example.com/docs/a?x=1&amp;y=2 </loc>
    <lastmod>2023-11-30</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>http://example.com/docs/b</loc><changefreq>weekly</changefreq></url>
  <url>
    <loc>http://example.com/archive</loc>
  </url>
</urlset>
"""
with open(os.path.join(OUT, "sitemap.xml"), "w") as f:
    f.write(sitemap)
