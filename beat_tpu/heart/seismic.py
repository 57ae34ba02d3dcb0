"""
Seismic waveform datasets and waveform mappings.

Re-design of the dataset/target machinery in ``beat/heart.py``
(``SeismicDataset`` :892, ``DynamicTarget`` :429, ``WaveformMapping``
:2884, ``init_datahandler``/``init_wavemap`` :3387-3465): a
WaveformMapping bundles the stations/channels selected by one
``WaveformFitConfig`` into fixed-shape arrays (station coordinates,
channel indexes, window start samples, taper, filter response) that the
on-device forward consumes, and processes the observed traces through
the *identical* taper/filter pipeline (``post_process_trace`` :3466).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from beat_tpu.covariance import Covariance, SeismicNoiseAnalyser
from beat_tpu.heart.gftable import GreensTable, component_index
from beat_tpu.heart.taper import ArrivalTaper, Filter

logger = logging.getLogger("beat_tpu.heart.seismic")


@dataclass
class SeismicDataset:
    """One observed trace: station/channel + raw samples on the table
    time grid (t0-aligned), with noise covariance over the fit window."""

    station: str
    channel: str                  # 'Z' | 'R' | 'T'
    east: float                   # station local coordinates [m]
    north: float
    ydata: np.ndarray             # raw trace on the table grid
    covariance: Covariance | None = None

    @property
    def samples(self) -> int:
        return int(self.ydata.size)


@dataclass
class WaveformMapping:
    """
    Targets of one WaveformFitConfig (reference ``WaveformMapping``
    ``heart.py:2884``): shared phase, taper, filter and window length.
    """

    name: str                      # e.g. 'any_P'
    datasets: list                 # of SeismicDataset
    table: GreensTable
    taper: ArrivalTaper
    filterer: Filter
    domain: str = "time"           # time | spectrum
    quantity: str = "displacement"  # | velocity | acceleration
    station_corrections: bool = False
    #: picked arrival times per station [s after origin], overriding the
    #: table's predicted arrivals (reference ``arrivals_marker_path``
    #: custom picks, ``config.py:540``)
    arrival_overrides: dict | None = None
    #: which event this wavemap belongs to in multi-event problems
    #: (reference ``WaveformFitConfig.event_idx`` ``config.py:580``;
    #: ``models/seismic.py:806`` uses only ``sources[event_idx]``)
    event_idx: int = 0
    #: (east, north, time) of this wavemap's event relative to the main
    #: event origin [m, m, s] — shifts reference arrivals and windows
    event_offset: tuple = (0.0, 0.0, 0.0)
    #: position of this wavemap in the config's waveforms list — same
    #: phase name may appear several times (multi-band, multi-event), so
    #: ids/hypernames are suffixed (reference ``mapnumber``/``_mapid``
    #: ``heart.py:2624-2638``)
    mapnumber: int = 0
    #: apply the wavemap's bandpass to the *observed* traces during
    #: preparation; set False when the data were already filtered
    #: offline (reference ``preprocess_data`` ``config.py:547``).
    #: Synthetics are always filtered.
    preprocess_data: bool = True

    # filled by prepare()
    station_east: np.ndarray = field(default=None)
    station_north: np.ndarray = field(default=None)
    comp_idx: np.ndarray = field(default=None)
    window_starts: np.ndarray = field(default=None)
    arrival_times: np.ndarray = field(default=None)
    taper_window: np.ndarray = field(default=None)
    filter_response: np.ndarray = field(default=None)
    data_windows: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.station_east is None:
            self.prepare()

    @property
    def ntargets(self) -> int:
        return len(self.datasets)

    @property
    def nsamples_win(self) -> int:
        return self.taper.nsamples(self.table.dt)

    @property
    def nsamples_fit(self) -> int:
        """Samples entering the likelihood: window length (time domain) or
        rfft bins (spectrum domain; reference ``domain='spectrum'`` fits
        amplitude spectra, ``config.py:540`` + ``heart.fft_transforms``)."""
        if self.domain == "spectrum":
            return self.nsamples_win // 2 + 1
        return self.nsamples_win

    def fit_transform_np(self, windows: np.ndarray) -> np.ndarray:
        """Window → fit space (host): identity or amplitude spectrum."""
        if self.domain == "spectrum":
            return np.abs(np.fft.rfft(windows, axis=-1))
        return windows

    def fit_basis(self):
        """(C, S) rfft bases for the on-device spectrum transform."""
        from beat_tpu.ops.cplx import rfft_basis

        return rfft_basis(self.nsamples_win)

    @property
    def mapid(self) -> str:
        """Unique wavemap id ``<name>_<mapnumber>`` (reference ``_mapid``
        ``heart.py:2636``)."""
        return f"{self.name}_{self.mapnumber}"

    @property
    def hypername(self) -> str:
        return f"h_{self.mapid}"

    def prepare(self, reference_distance_point=None) -> None:
        """
        Precompute geometry, windows, and process observed data
        (reference ``prepare_data`` ``heart.py:3041``): arrival times are
        evaluated at the reference event location so window shapes stay
        chain-invariant (SURVEY §7 hard part 1); the source ``time``
        parameter moves the synthetics via phase shifts instead.  The
        reference point defaults to this wavemap's event offset
        (multi-event: each wavemap windows around its own event).
        """
        import jax.numpy as jnp

        if reference_distance_point is None:
            reference_distance_point = self.event_offset[:2]
        dt = self.table.dt
        if self.nsamples_win > self.table.nt:
            raise ValueError(
                f"Arrival taper window ({self.taper.duration:.1f} s = "
                f"{self.nsamples_win} samples) exceeds the GF table length "
                f"({self.table.nt} samples at dt={dt}) — shorten the taper "
                "or build a longer table")
        self.station_east = np.array([ds.east for ds in self.datasets])
        self.station_north = np.array([ds.north for ds in self.datasets])
        self.comp_idx = np.array([component_index[ds.channel] for ds in self.datasets],
                                 dtype=np.int32)
        e0, n0 = reference_distance_point
        dist = np.sqrt((self.station_east - e0) ** 2 + (self.station_north - n0) ** 2)
        # reference arrivals at the mid-depth of the table grid
        z_ref = float(np.mean(self.table.depths))
        self.arrival_times = np.array(
            self.table.travel_time(self.name, jnp.asarray(dist), z_ref))
        # subevent wavemaps: arrivals are delayed by the event's time
        # offset from the main origin (reference ``source.time +=
        # events[event_idx].time`` ``pytensorf.py:278``)
        self.arrival_times = self.arrival_times + float(self.event_offset[2])
        if self.arrival_overrides:
            for i, ds in enumerate(self.datasets):
                if ds.station in self.arrival_overrides:
                    self.arrival_times[i] = float(
                        self.arrival_overrides[ds.station])
        start_times = self.arrival_times + self.taper.a - self.table.t0
        self.window_starts = np.clip(
            np.round(start_times / dt).astype(np.int32),
            0, self.table.nt - self.nsamples_win)
        self.taper_window = self.taper.window(dt)
        # observed traces (assumed restituted to `quantity` already) see
        # the plain bandpass; synthetics from the displacement GF tables
        # additionally fold (iω)^n into their response — zero runtime
        # cost (reference WaveformFitConfig.quantity, config.py:562)
        self.filter_response_obs = self.filterer.response(self.table.nt, dt)
        n_diff = {"displacement": 0, "velocity": 1,
                  "acceleration": 2}.get(self.quantity)
        if n_diff is None:
            raise ValueError(f"Unknown quantity {self.quantity!r} "
                             "(displacement|velocity|acceleration)")
        w = 2.0 * np.pi * np.fft.rfftfreq(self.table.nt, dt)
        self.filter_response = self.filter_response_obs * (1j * w) ** n_diff
        self._process_observed()

    def _process_observed(self) -> None:
        """Filter + chop + taper the raw observed traces — the same
        pipeline the synthetics take (``post_process_trace`` :3466)."""
        wins = []
        n_win = self.nsamples_win
        resp = self.filter_response_obs if self.preprocess_data else 1.0
        for ds, start in zip(self.datasets, self.window_starts):
            spec = np.fft.rfft(ds.ydata, n=self.table.nt)
            filtered = np.fft.irfft(spec * resp, n=self.table.nt)
            win = filtered[start:start + n_win] * self.taper_window
            wins.append(win)
        self.data_windows = np.stack(wins).astype(np.float32)

    @property
    def data_fit(self) -> np.ndarray:
        """Observed data in fit space (windows, or amplitude spectra for
        ``domain='spectrum'``) — derived from ``data_windows`` so direct
        window assignment (synthetic tests, weight updates) stays
        consistent."""
        return self.fit_transform_np(self.data_windows).astype(np.float32)

    def analyse_noise(self, analyser: SeismicNoiseAnalyser | None = None) -> None:
        """Set per-dataset covariances over the fit window
        (reference ``SeismicComposite.analyse_noise`` ``models/seismic.py:162``)."""
        analyser = analyser or SeismicNoiseAnalyser(structure="variance")
        dt = self.table.dt
        resp = self.filter_response_obs if self.preprocess_data else 1.0
        for ds, start, arr in zip(self.datasets, self.window_starts, self.arrival_times):
            spec = np.fft.rfft(ds.ydata, n=self.table.nt)
            filtered = np.fft.irfft(spec * resp, n=self.table.nt)
            pre_arrival_idx = max(int(round((arr - self.table.t0 - 1.0) / dt)), 2)
            noise = filtered[:pre_arrival_idx]
            var = float(np.var(noise)) if noise.size > 2 else float(np.var(filtered))
            if self.domain == "spectrum":
                # noise variance of the amplitude spectrum scales with the
                # window noise level × sqrt(n)
                cov = np.eye(self.nsamples_fit) * max(var, 1e-30) * self.nsamples_win
            else:
                # covariance over the FIT WINDOW samples, variance level
                # from the pre-arrival noise segment (passing the full
                # trace prefix here would size the matrix start+nwin and
                # silently lose the configured structure)
                window = filtered[start:start + self.nsamples_win]
                cov = analyser.get_data_covariance(window, dt, noise=noise)
            ds.covariance = Covariance(data=cov)

    def get_station_names(self) -> list:
        return [ds.station for ds in self.datasets]

    def station_weeding(self, blacklist=(), distances=None,
                        event_east: float = 0.0, event_north: float = 0.0) -> int:
        """
        Remove blacklisted stations and stations outside the epicentral
        distance range [m] (reference ``station_weeding``
        ``heart.py:2952`` + ``WaveformFitConfig.blacklist/distances``).
        Returns the number of removed datasets; re-prepares the mapping.
        """
        kept = []
        for ds in self.datasets:
            if ds.station in blacklist or f"{ds.station}.{ds.channel}" in blacklist:
                continue
            if distances is not None:
                dist = np.hypot(ds.east - event_east, ds.north - event_north)
                if not (distances[0] <= dist <= distances[1]):
                    continue
            kept.append(ds)
        removed = len(self.datasets) - len(kept)
        if not kept:
            raise ValueError(
                f"station weeding removed every station of wavemap "
                f"{self.name} (blacklist {list(blacklist)}, distance range "
                f"{distances}) — widen the distances or fix the blacklist")
        if removed:
            self.datasets = kept
            self.prepare()
        return removed

    def time_shift_names(self) -> list:
        """Hierarchical station-correction names
        (reference ``init_hierarchicals`` ``models/seismic.py:198``)."""
        if not self.station_corrections:
            return []
        return [f"{self.mapid}_{ds.station}_time_shift" for ds in self.datasets]
