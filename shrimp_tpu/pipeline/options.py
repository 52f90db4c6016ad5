"""Mapping option-sets — the reference's strategy-config system.

Mirrors `read_mapping_options_t` (gmapper/gmapper-definitions.h:262-278) and
its construction (gmapper/gmapper.c:2599-2716).  A read is driven through an
*array* of option sets until one reports `done` — that is how half-paired
fallback and multi-round mapping strategies are expressed (SURVEY.md §5.6).

Threshold convention (common/util.h:44-56): values < 0 are absolute scores
(stored negated); values >= 0 are percentages of the max score.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from shrimp_tpu.ops.params import SWParams


def is_absolute(x: float) -> bool:
    return x < 0


def abs_or_pct(x: float, base: float) -> float:
    return -x if x < 0 else base * (x / 100.0)


@dataclass
class RegionOptions:
    recompute: bool = True
    min_seed: int = 0          # unused placeholder for parity


@dataclass
class AnchorListOptions:
    recompute: bool = True
    collapse: bool = True
    use_region_counts: bool = False   # set by option-set construction
    use_mp_region_counts: int = 0


@dataclass
class HitListOptions:
    recompute: bool = True
    gapless: bool = False
    match_mode: int = 2               # DEF_MATCH_MODE_UNPAIRED
    threshold: float = 55.0           # DEF_WINDOW_GEN_THRESHOLD


@dataclass
class Pass1Options:
    recompute: bool = True
    only_paired: bool = False
    gapless: bool = False
    num_outputs: int = 30             # 3 * DEF_NUM_OUTPUTS (gmapper.c:2609)
    threshold: float = 50.0           # DEF_SW_FULL_THRESHOLD (ls)
    window_overlap: float = 90.0      # DEF_WINDOW_OVERLAP
    min_matches: int = 2


@dataclass
class Pass2Options:
    strata: bool = False
    save_outputs: bool = False
    num_outputs: int = 10             # DEF_NUM_OUTPUTS
    threshold: float = 50.0
    # multi-round fall-through control (read_pass2 tail, mapping.c:1752-1766)
    stop_count: int = 0
    stop_threshold: float = 50.0


@dataclass
class StopOptions:
    stop_count: int = 0
    stop_threshold: float = 50.0


@dataclass
class ReadMappingOptions:
    regions: RegionOptions = field(default_factory=RegionOptions)
    anchor_list: AnchorListOptions = field(default_factory=AnchorListOptions)
    hit_list: HitListOptions = field(default_factory=HitListOptions)
    pass1: Pass1Options = field(default_factory=Pass1Options)
    pass2: Pass2Options = field(default_factory=Pass2Options)
    stop: StopOptions = field(default_factory=StopOptions)


@dataclass
class MapperConfig:
    """Global knobs (the EXTERN globals registry, gmapper/gmapper.h:30-226)."""

    colour_space: bool = False
    params: SWParams = field(default_factory=SWParams.letter_space)
    window_len: float = 140.0         # DEF_WINDOW_LEN (pct of read len)
    window_overlap: float = 90.0
    num_outputs: int = 10
    max_alignments: int = 0           # 0 = unlimited
    longest_read_len: int = 1000
    list_cutoff: int = 0xFFFFFFFF
    anchor_width: int = 8
    match_mode_unpaired: int = 2
    gapless: bool = False
    global_alignment: bool = True     # Gflag; global by default since v2.2.0
    rev_tiebreak: bool = True         # Tflag (gmapper.h:91, default true)
    strata: bool = False
    half_paired: bool = True
    compute_mapping_qualities: bool = True
    single_best_mapping: bool = False
    sam_unaligned: bool = False
    qual_delta: int = 33              # PHRED offset for *letter space* output
    ignore_qvs: bool = False          # gmapper.h:105
    indel_taboo_len: int = 0          # DEF_INDEL_TABOO_LEN
    qual_vector_offset: int = 0       # gmapper.h:79 (CS: qv for primer base?)
    # user-settable thresholds (-r / -v / -h); <0 = absolute, >=0 = pct
    window_gen_threshold: float = 55.0        # DEF_WINDOW_GEN_THRESHOLD
    sw_vect_threshold: float | None = None    # default: 47 (cs) / full (ls)
    sw_full_threshold: float = 50.0           # DEF_SW_FULL_THRESHOLD
    strand_mask: int = 3              # bit 0: + strand, bit 1: - strand
    # on-device L3: True / False / "auto" (time both paths on the first
    # eligible batch and keep the winner — on co-located TPUs the device
    # path wins, through a high-latency tunnel the native host path does)
    device_candidates: object = "auto"
    # "auto" device-L3 only ships the CSR postings to HBM when the
    # estimated one-time transfer (posting bytes / a measured host->HBM
    # probe bandwidth) fits this budget: ~1 s for any index on a local
    # PCIe chip, while a Gbp index through a ~90 MB/s devserver tunnel
    # (minutes of stall) stays on the native host path.  True forces the
    # ship regardless.
    device_l3_ship_budget_secs: float = 15.0
    # Deferred-ship amortization (VERDICT r4 #3): past the immediate
    # budget the index still ships LAZILY, once the measured host-L3
    # seconds spent (ski-rental) — or the projection from an
    # expected_reads hint — exceed ship_est * this factor.  The one-time
    # ship then pays for itself on any sufficiently long run.
    device_l3_amortize_factor: float = 1.5
    # resident CSR postings must fit in HBM next to the genome plane and
    # the pass-1/pass-2 working buffers; larger indexes stay on the host
    device_l3_hbm_budget_bytes: float = 10e9
    # optional workload-size hint (total reads this run will map, e.g.
    # from the CLI counting a seekable FASTQ): enables the crossover
    # decision at the FIRST batch instead of waiting for ski-rental
    expected_reads: object = None
    # LS pass1 on-device window gather from the resident genome plane:
    # cuts per-batch host->device bytes ~20x AND replaces the host-side
    # window materialization with per-row HBM DMA (vmapped dynamic_slice;
    # the round-2 jnp.take formulation that measured slower is gone).
    # "auto" times both paths on the first production-shape chunk on TPU
    # (host path is kept on CPU backends); True / False force a path
    device_pass1_gather: object = "auto"
    # pass-1 vector-SW formulation: "auto" (time scan/rows/pallas at the
    # first production-shape batch on TPU and keep the fastest — all
    # three are bit-identical), or force one of sw_vector.PASS1_ENGINES;
    # $SHRIMP_TPU_PASS1 overrides
    pass1_engine: str = "auto"
    bfast: bool = False               # Bflag: bfast-style CS base quals
    all_contigs: bool = False         # suppresses Z-field emission
    sam_read_group_name: str | None = None   # --read-group id (RG:Z tag)
    extra_sam_fields: bool = False    # --extra-sam-fields (ZM/ZR/ZV/ZH/ZE)
    sam_r2: bool = False              # --sam-r2: mate sequence R2/X2 tag

    def vect_threshold(self) -> float:
        if self.sw_vect_threshold is not None:
            return self.sw_vect_threshold
        return 47.0 if self.colour_space else self.sw_full_threshold
    anchor_list_big_gap: int = 1024
    # candidate-generation capacity knobs (TPU fixed-shape budgets)
    max_anchors_per_strand: int = 4096
    hit_lookback: int = 64            # window-pairing lookback depth

    use_regions: bool = True          # DEF_USE_REGIONS
    seed_qual_filter: bool = False    # --enable-seed-qual-filter (SQFflag)

    def unpaired_options(self) -> list[ReadMappingOptions]:
        """Default single unpaired option set (gmapper.c:2601-2632)."""
        opts = ReadMappingOptions()
        opts.anchor_list.use_region_counts = (
            self.match_mode_unpaired == 2 and self.use_regions)
        opts.hit_list.match_mode = self.match_mode_unpaired
        opts.hit_list.gapless = self.gapless
        opts.hit_list.threshold = self.window_gen_threshold
        opts.pass1.gapless = self.gapless
        opts.pass1.min_matches = self.match_mode_unpaired
        opts.pass1.num_outputs = 3 * self.num_outputs
        opts.pass1.window_overlap = self.window_overlap
        opts.pass1.threshold = self.vect_threshold()
        opts.pass2.num_outputs = self.num_outputs
        opts.pass2.strata = self.strata
        opts.pass2.threshold = self.sw_full_threshold
        return [opts]


def _parse_threshold(tok: str) -> float:
    """get_threshold (gmapper.c): plain integers are absolute (stored
    negated); '%' or '.' marks a percentage."""
    v = float(tok.rstrip("%"))
    if v < 0:
        raise ValueError(f"invalid threshold {tok!r}")
    if "%" not in tok and "." not in tok:
        return -v
    return v


def _parse_bool(tok: str) -> bool:
    if tok in ("true", "1"):
        return True
    if tok in ("false", "0"):
        return False
    raise ValueError(f"invalid bool {tok!r}")


@dataclass
class PairingOptions:
    """pairing_options (gmapper/gmapper-definitions.h:280-297)."""

    pair_mode: int = 0                # PAIR_NONE
    min_insert_size: int = 50         # DEF_MIN_INSERT_SIZE
    max_insert_size: int = 2000       # DEF_MAX_INSERT_SIZE
    pass1_num_outputs: int = 30
    pass1_threshold: float = 50.0
    pass2_num_outputs: int = 10
    pass2_threshold: float = 50.0
    stop_count: int = 0
    stop_threshold: float = 50.0
    strata: bool = False
    save_outputs: bool = True


@dataclass
class ReadPairMappingOptions:
    """readpair_mapping_options_t (gmapper-definitions.h:299-305)."""

    pairing: PairingOptions = field(default_factory=PairingOptions)
    read: tuple[ReadMappingOptions, ReadMappingOptions] = field(
        default_factory=lambda: (ReadMappingOptions(), ReadMappingOptions()))


PAIR_MODE_NAMES = {"none": 0, "opp-in": 1, "opp-out": 2,
                   "col-fw": 3, "col-bw": 4}


def parse_pairing_options(text: str) -> PairingOptions:
    """get_pairing_options (gmapper.c:1586-1616): comma-separated
    pair_mode,min_ins,max_ins,p1_num,p1_thr,p2_num,p2_thr,stop_cnt,stop_thr,
    strata,save_outputs."""
    f = text.split(",")
    if f[0] not in PAIR_MODE_NAMES:
        raise ValueError(f"invalid pair mode {f[0]!r}")
    return PairingOptions(
        pair_mode=PAIR_MODE_NAMES[f[0]],
        min_insert_size=int(f[1]),
        max_insert_size=int(f[2]),
        pass1_num_outputs=int(f[3]),
        pass1_threshold=_parse_threshold(f[4]),
        pass2_num_outputs=int(f[5]),
        pass2_threshold=_parse_threshold(f[6]),
        stop_count=int(f[7]),
        stop_threshold=_parse_threshold(f[8]),
        strata=_parse_bool(f[9]),
        save_outputs=_parse_bool(f[10]),
    )


def parse_readpair_mapping_options(text: str) -> ReadPairMappingOptions:
    """--paired-options string: '<pairing>;<read0>;<read1>'
    (gmapper.c:2181-2199, case 28)."""
    parts = text.split(";")
    if len(parts) != 3:
        raise ValueError("paired options need 3 ';'-separated sections")
    return ReadPairMappingOptions(
        pairing=parse_pairing_options(parts[0]),
        read=(parse_read_mapping_options(parts[1], is_paired=True),
              parse_read_mapping_options(parts[2], is_paired=True)),
    )


def parse_read_mapping_options(text: str,
                               is_paired: bool = False) -> ReadMappingOptions:
    """The experimental option-set string grammar (get_read_mapping_options,
    gmapper.c:1620-1716): '/'-separated sections
    regions/anchor_list/hit_list/pass1/pass2[/stop], comma-separated values.
    """
    opts = ReadMappingOptions()
    secs = text.split("/")
    it = iter(secs)
    # regions
    f = next(it).split(",")
    opts.regions.recompute = _parse_bool(f[0])
    # anchor_list
    f = next(it).split(",")
    opts.anchor_list.recompute = _parse_bool(f[0])
    if opts.anchor_list.recompute:
        opts.anchor_list.collapse = _parse_bool(f[1])
        opts.anchor_list.use_region_counts = _parse_bool(f[2])
        if is_paired:
            opts.anchor_list.use_mp_region_counts = int(f[3])
    # hit_list
    f = next(it).split(",")
    opts.hit_list.recompute = _parse_bool(f[0])
    if opts.hit_list.recompute:
        opts.hit_list.gapless = _parse_bool(f[1])
        opts.hit_list.match_mode = int(f[2])
        opts.hit_list.threshold = _parse_threshold(f[3])
    # pass1
    f = next(it).split(",")
    opts.pass1.recompute = _parse_bool(f[0])
    if opts.pass1.recompute:
        opts.pass1.threshold = _parse_threshold(f[1])
        opts.pass1.window_overlap = _parse_threshold(f[2])
        opts.pass1.min_matches = int(f[3])
        opts.pass1.gapless = _parse_bool(f[4])
        if is_paired:
            opts.pass1.only_paired = _parse_bool(f[5])
        else:
            opts.pass1.num_outputs = int(f[5])
    # pass2
    f = next(it).split(",")
    opts.pass2.threshold = _parse_threshold(f[0])
    if not is_paired:
        opts.pass2.strata = _parse_bool(f[1])
        opts.pass2.save_outputs = _parse_bool(f[2])
        opts.pass2.num_outputs = int(f[3])
        # stop
        f = next(it).split(",")
        opts.pass2.stop_count = int(f[0])
        if opts.pass2.stop_count > 0:
            opts.pass2.stop_threshold = _parse_threshold(f[1])
    return opts
