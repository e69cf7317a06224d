#!/usr/bin/env python3
"""Reference-execution parity for the ProHap/ProVar core pipeline.

Runs the reference Python modules VERBATIM (imported from
/root/reference/src -- nothing is copied or edited) on the repo's
committed fixtures and diffs the results row-for-row against the gate
snapshots in fixtures/expected/ (h4_protein_db, h5_protein_dedup,
f9_cdna_write, pv1_provar), which the driver gate hash-checks the live
Spark pipeline against at every round.

Only external scaffolding is vendored here:
  - tools/refshim/Bio/Seq.py: ~60-line Biopython shim (public NCBI
    standard codon table) because Biopython is absent in the sandbox;
  - an in-memory stand-in for the gffutils FeatureDB, built from the
    same fixture GTF the reference would build its sqlite DB from;
  - input normalization the reference otherwise gets from its
    Snakemake driver: per-chromosome VCF splits, position-sorted.

Documented divergences normalized before diffing (each tagged D#):
  D1 list ordering: samples / population strings / parallel change
     lists -- ours deterministic-sorted, reference insertion-order.
     Both sides canonicalized (sorted) before compare.
  D2 identifiers: haplotype/accession IDs are enumeration-order in the
     reference (hex(i)) and content-derived in ours -- IDs dropped;
     rows keyed on (transcript, VCF-id set).
  D3 frequency: ours round(.,6) -- compared with 2e-6 tolerance;
     population-frequency strings parsed and compared at 1e-5 (both
     sides format %.5f; the reference re-formats a sum of formatted
     values when merging haplotypes).
  D4 pv1 vcf id: ours appends ':<ALT>' to disambiguate multi-allelic
     lines -- suffix stripped; rows keyed (transcript, id, DNA change).
  D5 pv1 'start_missing': the reference stores `start_codon is not
     None` under that column name (process_variants.py:231), i.e. the
     INVERTED flag; ours stores the actual missing flag. Reference
     value inverted before compare.
  D6 VCF preprocessing: the reference pipeline NEVER feeds raw VCFs to
     prohap/provar -- Snakefile:246 runs src/vcf_filter_fix.py first,
     which splits multi-allelic lines one-per-allele (recoding GTs:
     allele k -> 1, others -> 0) and pads haploid male chrX calls to
     'g|0'. The parity run invokes the reference's OWN vcf_filter_fix.py
     on the fixture VCF (with -af 1e-6: the script only preserves the
     per-allele MAF annotation when the threshold is positive,
     vcf_filter_fix.py:76-78, and every fixture AF is >= 0.01 so
     nothing is filtered). Our engine reads the raw multi-allelic /
     haploid VCF directly.
  D7 f9/h5 dedup scope: the reference dedups sequences per transcript
     and keeps the first-encountered start (iteration order); ours
     dedups globally with min(start) and sorted haplotype lists.
     Reference entries re-grouped globally before compare.
  D8 h4 sample list on merge: when two haplotypes collapse to the same
     VCF-id set after UTR filtering, the reference sums counts and
     frequencies but keeps only the FIRST row's sample list
     (process_haplotypes.py:405-409 updates indices 16-19, not 20), so
     its occurrence_count can exceed its listed samples; ours keeps the
     full merged list. Compared as: reference samples a subset of ours,
     ours consistent with the (equal) merged count.
  D9 f9 cDNA tail on stop-loss run-through: when a haplotype loses its
     stop codon and no downstream stop exists, the reference computes
     cdna_stop = reading_frame + (-1)*3 BEFORE patching first_stop
     (process_haplotypes.py:375-381), so the Python slice
     [cdna_start:rf-3] silently chops the trailing bases; ours keeps
     the CDS to the last complete codon. Compared as: reference cDNA a
     prefix of ours with < 3 trailing bases difference.

Usage: python3 tools/refparity.py   (writes tools/refparity_report.md,
exit 0 iff every check passes)
"""
import os
import re
import sys
import shutil
import tempfile

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools", "refshim"))
sys.path.insert(0, "/root/reference/src")

from modules.vcf_reader import parse_vcf                    # noqa: E402
from modules.common import read_fasta                       # noqa: E402
from modules.get_haplotypes import get_gene_haplotypes      # noqa: E402
from modules.process_haplotypes import process_haplotypes   # noqa: E402
from modules.process_variants import process_store_variants # noqa: E402

FIX = os.path.join(REPO, "fixtures")
VCF = f"{FIX}/sample.vcf"
GTF = f"{FIX}/annotations.gtf"
CDNA = f"{FIX}/cdna.fasta"
SAMPLES = f"{FIX}/samples.tsv"
EXP = f"{FIX}/expected"
PAR1_TO, PAR2_FROM = 15, 100  # fixture-scaled PAR bounds (CliSpec opts)


# ---------------------------------------------------------------- gffutils
class Feature:
    """Just enough of gffutils.Feature for the reference modules:
    .id/.start/.end/.strand and attribute access via [] (returning the
    gffutils list-of-values shape)."""

    def __init__(self, seqid, ftype, start, end, strand, attrs):
        self.seqid = seqid
        self.featuretype = ftype
        self.start = start
        self.end = end
        self.strand = strand
        self.attrs = attrs
        self.id = (attrs.get("transcript_id", [None])[0]
                   if ftype == "transcript" else None)

    def __getitem__(self, key):
        return self.attrs[key]


class MiniDB:
    """Just enough of gffutils.FeatureDB: db[transcript_id] and
    db.children(feature, featuretype=..., order_by='start')."""

    def __init__(self, gtf_path):
        self.features = []
        for line in open(gtf_path):
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            attrs = {}
            for m in re.finditer(r'(\w+) "([^"]*)"', f[8]):
                attrs.setdefault(m.group(1), []).append(m.group(2))
            self.features.append(
                Feature(f[0], f[2], int(f[3]), int(f[4]), f[6], attrs))
        self.by_id = {ft.id: ft for ft in self.features if ft.id}

    def __getitem__(self, tid):
        return self.by_id[tid]

    def children(self, feature, featuretype=None, order_by="start"):
        out = [ft for ft in self.features
               if ft.featuretype != "transcript"
               and ft.attrs.get("transcript_id", [None])[0] == feature.id
               and (featuretype is None or ft.featuretype == featuretype)]
        return sorted(out, key=lambda x: x.start)


# ------------------------------------------------------------ input prep
def split_vcf(chrom, dst):
    """Per-chromosome, position-sorted VCF (the reference's sweep-line
    reader assumes both; its Snakemake driver feeds it per-chromosome
    sorted files), then passed through the reference's OWN
    vcf_filter_fix.py preprocessor (D6)."""
    import gzip
    import subprocess
    raw = dst + ".raw"
    hdr, rows = [], []
    for line in open(VCF):
        if line.startswith("#"):
            hdr.append(line)
        else:
            f = line.split("\t", 2)
            if f[0] == chrom:
                rows.append((int(f[1]), line))
    rows.sort(key=lambda r: r[0])
    with open(raw, "w") as fh:
        fh.writelines(hdr)
        fh.writelines(l for _, l in rows)
    subprocess.run(
        [sys.executable, "/root/reference/src/vcf_filter_fix.py",
         "-i", raw, "-chr", chrom, "-af", "0.000001", "-o", dst + ".gz"],
        check=True, capture_output=True)
    with gzip.open(dst + ".gz", "rt") as src, open(dst, "w") as out:
        out.write(src.read())


def transcripts_for(db, chrom):
    # require_start=0 (the gate keeps start-codon-less transcripts at
    # rf -1, mirroring the CLI option) -> all transcripts, start-sorted
    ts = [f for f in db.features
          if f.featuretype == "transcript" and f.seqid == chrom]
    ts.sort(key=lambda t: t.start)
    return ts


def samples_ref():
    # reference column-name convention
    return pd.read_csv(SAMPLES, sep="\t").rename(columns={
        "sample": "Sample name", "sex": "Sex",
        "population": "Population code",
        "superpopulation": "Superpopulation code"})


# --------------------------------------------------------- reference runs
def run_prohap(db, chrom, tmp):
    vcf_path = f"{tmp}/{chrom}.vcf"
    split_vcf(chrom, vcf_path)
    tdir = f"{tmp}/hap_{chrom}"
    os.makedirs(tdir, exist_ok=True)
    ts = transcripts_for(db, chrom)
    colnames = parse_vcf(ts, open(vcf_path), db, 0.0, tdir)
    if not colnames:
        return None
    sdf = samples_ref()
    sample_ids = [s for s in colnames if s in set(sdf["Sample name"])]
    ghdf = get_gene_haplotypes(ts, sample_ids, tdir, f"{tmp}/hap_{chrom}.log",
                               1, chrom == "X", PAR1_TO, PAR2_FROM, sdf)
    all_cds = read_fasta(CDNA, True)
    # prohap.py defaults: force_rf 1, min_freq -1, min_count 0,
    # ignore_UTR 1, skip_start_lost 1; cDNA output on. id_prefix is
    # made chromosome-unique (the reference runs one process per
    # chromosome and never mixes the enumeration-order IDs; pooling
    # both chromosomes here would alias them).
    return process_haplotypes(ts, ghdf, all_cds, db, chrom,
                              f"haplo{chrom}", 1, 1, -1, 0, True, True,
                              True)


def run_provar(db, chrom, tmp):
    vcf_path = f"{tmp}/{chrom}.vcf"
    if not os.path.exists(vcf_path):
        split_vcf(chrom, vcf_path)
    tdir = f"{tmp}/var_{chrom}"
    os.makedirs(tdir, exist_ok=True)
    ts = transcripts_for(db, chrom)
    colnames = parse_vcf(ts, open(vcf_path), db, 0.0, tdir)
    if not colnames:
        return None
    out_csv = f"{tmp}/provar_{chrom}.tsv"
    log = open(f"{tmp}/var_{chrom}.log", "w")
    fasta_out = f"{tmp}/provar_{chrom}.fa"
    process_store_variants(ts, tdir, log, read_fasta(CDNA, True), db, chrom,
                           "generic_var", "var", 1, out_csv, fasta_out,
                           f"{tmp}/provar_{chrom}_cdna.fa")
    log.close()
    df = pd.read_csv(out_csv, sep="\t")
    # variantID -> [(rf, sequence)] from the FASTA the reference wrote
    seqs = {}
    acc = None
    for line in open(fasta_out):
        if line.startswith(">"):
            desc = line[1:].rstrip("\n").split("|", 2)[2]
            m = re.match(r"matching_proteins:(\S*) start:(\S+) "
                         r"reading_frame:(\S*)", desc)
            acc = (m.group(1).split(";"), m.group(3).split(";"))
        else:
            for var_id, rf in zip(*acc):
                seqs.setdefault(var_id, []).append((rf, line.rstrip("\n")))
    return df, seqs


# ------------------------------------------------------------- normalizers
def sort_join(s, sep=";"):
    if s in ("", "-", None):
        return s if s is not None else ""
    return sep.join(sorted(str(s).split(sep)))


def pop_dict(s):
    if s in ("-", "", None) or (isinstance(s, float) and pd.isna(s)):
        return {}
    out = {}
    for part in str(s).split(";"):
        code, val = part.rsplit(":", 1)
        out[code] = float(val)
    return out


def pos_of(change):
    return int(str(change).split(":", 1)[0])


def sort_parallel(vcf_ids, dna, afs, cdna, prot_all, vtypes):
    """Canonical ascending-DNA-position order for the parallel ;-lists
    (D1: the reference emits them descending on '-' strand rows)."""
    cols = [str(x).split(";") if x not in ("", "-") else []
            for x in (vcf_ids, dna, afs, cdna, prot_all, vtypes)]
    n = max((len(c) for c in cols), default=0)
    cols = [c if len(c) == n else [""] * n for c in cols]
    order = sorted(range(n), key=lambda i: (pos_of(cols[1][i]), cols[1][i]))
    return tuple(";".join(c[i] for i in order) for c in cols)


def hap_labels(s):
    """Split a 'T1:rs1;rs4;T2:rs9'-style joined haplotype-label string
    into canonical labels: segments without ':' belong to the previous
    label (vcf-id lists are ';'-joined inside each label)."""
    labels = []
    for seg in str(s).split(";"):
        if ":" in seg or not labels:
            labels.append(seg)
        else:
            labels[-1] += ";" + seg
    return sorted(
        lab.split(":", 1)[0] + ":" + sort_join(lab.split(":", 1)[1])
        for lab in labels)


CHECKS = []


def check(name, ok, detail=""):
    CHECKS.append((name, bool(ok), detail))
    if not ok:
        print(f"FAIL {name}: {detail}")


# ------------------------------------------------------------------- main
def main():
    tmp = tempfile.mkdtemp(prefix="refparity_")
    db = MiniDB(GTF)
    chroms = sorted({f.seqid for f in db.features
                     if f.featuretype == "transcript"})

    hap_frames, hap_seqs, hap_cdnas = [], [], []
    for chrom in chroms:
        res = run_prohap(db, chrom, tmp)
        if res is not None:
            hap_frames.append(res[0])
            hap_seqs.extend(res[1])
            hap_cdnas.extend(res[2])
    ref_h4 = pd.concat(hap_frames, ignore_index=True)

    # --- h4: reference result rows vs gate snapshot ---------------------
    ours_h4 = pd.read_parquet(f"{EXP}/h4_protein_db.parquet")
    # haplotypeID -> (transcript, canonical vcf_ids) for h5/f9 labels
    hap_id_label = {}
    # reference protein sequence per haplotypeID: {hapID: [(rf, seq)]}
    ref_seq_by_hap = {}
    for seq in hap_seqs:
        for hap_id, rf in zip(seq["haplotypes"], seq["rfs"]):
            ref_seq_by_hap.setdefault(hap_id, []).append(
                (rf, str(seq["sequence"])))

    def h4_key(transcript, vcf_ids):
        return (transcript, frozenset(str(vcf_ids).split(";")))

    ref_rows = {}
    for _, r in ref_h4.iterrows():
        ref_rows[h4_key(r["TranscriptID"], r["VCF_IDs"])] = r
        hap_id_label[r["HaplotypeID"]] = (
            r["TranscriptID"] + ":" + sort_join(r["VCF_IDs"]))

    check("h4 row count", len(ref_rows) == len(ours_h4),
          f"reference {len(ref_rows)} vs gate {len(ours_h4)}")

    for _, o in ours_h4.iterrows():
        key = h4_key(o["transcript"], o["vcf_ids"])
        tag = f"h4 {o['transcript']}:{o['vcf_ids']}"
        r = ref_rows.get(key)
        if r is None:
            check(tag, False, "row missing from reference output")
            continue
        rn = sort_parallel(r["VCF_IDs"], r["DNA_changes"],
                           r["allele_frequencies"], r["cDNA_changes"],
                           r["all_protein_changes"], r["variant_types"])
        on = sort_parallel(o["vcf_ids"], o["dna_changes"],
                           o["allele_freqs"], o["cdna_changes"],
                           o["all_protein_changes"], o["variant_types"])
        raf = [float(x) for x in rn[2].split(";") if x != ""]
        oaf = [float(x) for x in on[2].split(";") if x != ""]
        check(f"{tag} changes",
              rn[:2] == on[:2] and rn[3:] == on[3:] and raf == oaf,
              f"ref {rn} vs ours {on}")
        check(f"{tag} scalar fields",
              str(r["chromosome"]) == str(o["chromosome"])
              and r["transcript_biotype"] == o["biotype"]
              and int(r["reading_frame"]) == int(o["reading_frame"])
              and int(r["protein_prefix_length"])
              == int(o["protein_prefix_length"])
              and bool(r["start_missing"]) == bool(o["start_missing"])
              and bool(r["start_lost"]) == bool(o["start_lost"])
              and str(r["splice_sites_affected"])
              == str(o["splice_sites_affected"]),
              f"ref {r.tolist()} vs ours {o.tolist()}")
        check(f"{tag} protein_changes",
              sorted(str(r["protein_changes"]).split(";"))
              == sorted(str(o["protein_changes"]).split(";"))
              or (str(r["protein_changes"]) in ("", "nan")
                  and str(o["protein_changes"]) in ("", "nan")),
              f"ref {r['protein_changes']!r} vs ours "
              f"{o['protein_changes']!r}")
        check(f"{tag} occurrence/frequency",
              int(r["occurrence_count"]) == int(o["occurrence_count"])
              and abs(float(r["frequency"]) - float(o["frequency"])) < 2e-6,
              f"ref {r['occurrence_count']}/{r['frequency']} vs ours "
              f"{o['occurrence_count']}/{o['frequency']}")
        ref_samps = set(str(r["samples"]).split(";"))
        our_samps = set(str(o["samples"]).split(";"))
        # D8: on a post-UTR-filter merge the reference keeps only the
        # first row's sample list (counts still sum on both sides)
        check(f"{tag} samples",
              our_samps == ref_samps
              or (ref_samps <= our_samps
                  and len(our_samps) == int(o["occurrence_count"])),
              f"ref {r['samples']} vs ours {o['samples']}")
        for rc, oc, nm in ((r["frequency_population"],
                            o["frequency_population"], "pop"),
                           (r["frequency_superpopulation"],
                            o["frequency_superpopulation"], "superpop")):
            rd, od = pop_dict(rc), pop_dict(oc)
            check(f"{tag} {nm} freq",
                  set(rd) == set(od)
                  and all(abs(rd[k] - od[k]) < 1e-5 for k in rd),
                  f"ref {rc} vs ours {oc}")
        # sequences: rf>-1 -> single; rf=-1 -> frames 0/1/2
        rseqs = dict(ref_seq_by_hap.get(r["HaplotypeID"], []))
        if int(o["reading_frame"]) >= 0:
            ref_seq = rseqs.get(str(int(r["reading_frame"])))
            check(f"{tag} protein_sequence",
                  ref_seq == o["protein_sequence"]
                  and o["alt_frame_sequences"] == "-",
                  f"ref {ref_seq} vs ours {o['protein_sequence']}")
        else:
            ours3 = [o["protein_sequence"]] + \
                str(o["alt_frame_sequences"]).split(";")
            check(f"{tag} 3-frame sequences",
                  [rseqs.get("0"), rseqs.get("1"), rseqs.get("2")] == ours3,
                  f"ref {rseqs} vs ours {ours3}")

    for key in ref_rows:
        if not ((ours_h4["transcript"] == key[0])
                & (ours_h4["vcf_ids"].map(
                    lambda v: frozenset(str(v).split(";")) == key[1]))).any():
            check(f"h4 extra ref row {key}", False,
                  "reference emitted a row the gate lacks")

    # --- h5: protein dedup ----------------------------------------------
    ours_h5 = pd.read_parquet(f"{EXP}/h5_protein_dedup.parquet")
    # D7: re-group reference per-transcript entries globally by sequence
    ref_h5 = {}
    for seq in hap_seqs:
        ent = ref_h5.setdefault(str(seq["sequence"]), {"labels": [], "rfs": set()})
        for hap_id, rf in zip(seq["haplotypes"], seq["rfs"]):
            ent["labels"].append(hap_id_label[hap_id])
            ent["rfs"].add(rf)
    check("h5 sequence count", len(ref_h5) == len(ours_h5),
          f"reference {len(ref_h5)} vs gate {len(ours_h5)}")
    for _, o in ours_h5.iterrows():
        ent = ref_h5.get(o["protein_sequence"])
        tag = f"h5 {o['protein_sequence']}"
        if ent is None:
            check(tag, False, "sequence missing from reference output")
            continue
        check(tag,
              sorted(ent["labels"]) == hap_labels(o["haplotypes"])
              and len(ent["labels"]) == int(o["n_haplotypes"])
              and ";".join(sorted(ent["rfs"])) == str(o["rfs"]),
              f"ref {ent} vs ours {o.tolist()}")

    # --- f9: cDNA dedup ---------------------------------------------------
    ours_f9 = pd.read_parquet(f"{EXP}/f9_cdna_write.parquet")
    # keyed by haplotype-label set (not sequence: D9 tail truncation)
    ref_f9 = {}
    for seq in hap_cdnas:  # D7 global regroup, min start
        labels = tuple(sorted(hap_id_label[h] for h in seq["haplotypes"]))
        ent = ref_f9.setdefault(labels, {"seqs": [], "start": None})
        ent["seqs"].append(str(seq["sequence"]))
        st = int(seq["start"])
        ent["start"] = st if ent["start"] is None else min(ent["start"], st)
    check("f9 sequence count", len(ref_f9) == len(ours_f9),
          f"reference {len(ref_f9)} vs gate {len(ours_f9)}")
    for _, o in ours_f9.iterrows():
        tag = f"f9 {o['accession']}"
        m = re.match(r"(.*) start:(-?\d+)$", o["description"])
        ent = ref_f9.get(tuple(hap_labels(m.group(1))))
        if ent is None:
            check(tag, False,
                  f"haplotypes {m.group(1)} missing from reference")
            continue
        seq_ok = any(
            rs == o["sequence"]
            or (str(o["sequence"]).startswith(rs)            # D9
                and len(o["sequence"]) - len(rs) < 3)
            for rs in ent["seqs"])
        check(tag, seq_ok and ent["start"] == int(m.group(2)),
              f"ref {ent} vs ours {o['description']} {o['sequence']}")

    # --- pv1: ProVar ------------------------------------------------------
    ours_pv = pd.read_parquet(f"{EXP}/pv1_provar.parquet")
    pv_frames, pv_seqs = [], {}
    for chrom in chroms:
        res = run_provar(db, chrom, tmp)
        if res is not None:
            pv_frames.append(res[0])
            pv_seqs.update(res[1])
    ref_pv = pd.concat(pv_frames, ignore_index=True)

    def pv_key(transcript, vcf_id, dna_change):
        return (transcript, str(vcf_id), str(dna_change))

    ref_pv_rows = {pv_key(r["transcriptID"], r["vcfID"], r["DNA_change"]): r
                   for _, r in ref_pv.iterrows()}
    check("pv1 row count", len(ref_pv_rows) == len(ours_pv),
          f"reference {len(ref_pv_rows)} vs gate {len(ours_pv)}")
    for _, o in ours_pv.iterrows():
        base_id = str(o["vcf_ids"]).rsplit(":", 1)[0]  # D4
        key = pv_key(o["transcript"], base_id, o["dna_changes"])
        tag = f"pv1 {o['transcript']}:{o['vcf_ids']}"
        r = ref_pv_rows.pop(key, None)
        if r is None:
            check(tag, False, "row missing from reference output")
            continue
        # pandas reads the reference's splice column as float ('-' rows
        # become NaN in a numeric column) -> normalize to the gate's
        # string form
        rspl = r["splice_site_affected"]
        rspl = "-" if pd.isna(rspl) else (
            str(int(rspl)) if isinstance(rspl, float) else str(rspl))
        check(f"{tag} fields",
              r["transcript_biotype"] == o["biotype"]
              and str(r["cDNA_change"]) == str(o["cdna_changes"])
              and str(r["protein_change"]) == str(o["all_protein_changes"])
              and int(r["reading_frame"]) == int(o["reading_frame"])
              and int(r["protein_prefix_length"])
              == int(o["protein_prefix_length"])
              and bool(r["start_missing"]) != bool(o["start_missing"])  # D5
              and bool(r["start_lost"]) == bool(o["start_lost"])
              and rspl == str(o["splice_sites_affected"]),
              f"ref {r.tolist()} vs ours {o.tolist()}")
        rseqs = dict(pv_seqs.get(r["variantID"], []))
        if int(o["reading_frame"]) >= 0:
            ref_seq = rseqs.get(str(int(r["reading_frame"])))
            check(f"{tag} protein_sequence",
                  ref_seq == o["protein_sequence"]
                  and o["alt_frame_sequences"] == "-",
                  f"ref {ref_seq} vs ours {o['protein_sequence']}")
        else:
            ours3 = [o["protein_sequence"]] + \
                str(o["alt_frame_sequences"]).split(";")
            check(f"{tag} 3-frame sequences",
                  [rseqs.get("0"), rseqs.get("1"), rseqs.get("2")] == ours3,
                  f"ref {rseqs} vs ours {ours3}")
    for key, r in ref_pv_rows.items():
        check(f"pv1 extra ref row {key}", False,
              "reference emitted a row the gate lacks")

    # ------------------------------------------------------------- report
    n_fail = sum(1 for _, ok, _ in CHECKS if not ok)
    lines = [
        "# Reference-execution parity report",
        "",
        "Generated by `python3 tools/refparity.py` -- the reference",
        "ProHap/ProVar modules (`/root/reference/src/modules/`) run",
        "verbatim on the committed fixtures (Bio shim:",
        "`tools/refshim/Bio/Seq.py`; gffutils stand-in + per-chromosome",
        "sorted VCF splits in the driver), diffed row-for-row against the",
        "gate snapshots `fixtures/expected/{h4_protein_db,",
        "h5_protein_dedup, f9_cdna_write, pv1_provar}.parquet`.",
        "",
        f"**{len(CHECKS)} checks, {n_fail} failures.** Documented",
        "divergences D1-D9 (see tools/refparity.py docstring) are",
        "normalized before comparison; everything else is compared",
        "exactly (sequences, changes, counts, flags) or at the stated",
        "float tolerance (frequencies).",
        "",
        f"- h4_protein_db: {len(ours_h4)} gate rows vs "
        f"{len(ref_rows)} reference rows",
        f"- h5_protein_dedup: {len(ours_h5)} gate sequences vs "
        f"{len(ref_h5)} reference sequences",
        f"- f9_cdna_write: {len(ours_f9)} gate cDNAs vs "
        f"{len(ref_f9)} reference cDNAs",
        f"- pv1_provar: {len(ours_pv)} gate rows vs "
        f"{len(ref_pv)} reference rows",
        "",
    ]
    if n_fail:
        lines.append("## Failures")
        lines += [f"- `{name}`: {detail}"
                  for name, ok, detail in CHECKS if not ok]
    else:
        lines.append("All checks passed: zero undocumented differences.")
    lines.append("")
    with open(os.path.join(REPO, "tools", "refparity_report.md"), "w") as fh:
        fh.write("\n".join(lines))
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"\n== {len(CHECKS) - n_fail}/{len(CHECKS)} parity checks pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
