"""Grid tiling + feathered stitching for arbitrary-size image serving.

The reference operates strictly on fixed-size patches: its dataset crops
aligned windows (``/root/reference/dataset.py:60-77``) and its test path
reconstructs single patches (``/root/reference/models/base.py:306-348``) —
there is no way to super-resolve a whole tile. Production rasters are far
bigger than one patch, so the serving layer needs to cover an (H, W)
image with an overlapping grid of model-sized windows, run each window
through the compiled endpoint, and blend the outputs back seamlessly.

This module is the pure array logic for that: ``grid_starts`` places the
windows (stride = patch - overlap, last window flush to the edge),
``stitch`` re-assembles per-window outputs with separable feather weights
(linear ramps over the overlap band) normalized by the accumulated weight
so coverage differences never change brightness. If every window output
is a crop of one underlying image, ``stitch`` reproduces that image
exactly — the blend only acts where neighboring windows disagree.

``TileEndpoints`` packages that logic as the whole-raster endpoint mixin
shared by the local compiled resolver (``serve.SuperResolver``) and the
HTTP client's remote resolver (``client.Client.resolver()``): anything
with a ``window`` size, a ``normalize`` flag and a batched
``super_resolve`` gets ``super_resolve_tile`` / ``uncertainty_tile`` and
the bounded-memory ``iter_tile_rows`` sweep for free, with identical
stitching semantics on both sides of the wire.

Everything here is host-side numpy on purpose: it is O(pixels) cheap next
to the model, keeping it out of the jitted graph means one compiled
(batch, patch, patch, C) model shape serves every tile size, and the
module stays importable without the compute stack (the stdlib HTTP
client drives it against a remote server).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def subseed(seed: int, *path: int) -> int:
    """Deterministic well-mixed sub-seed for dispatch ``path`` of a seeded
    request.

    The tile/stream endpoints fan one request out into many model
    dispatches; per-request reproducibility needs every dispatch to get a
    seed that is (a) a pure function of the request seed and the
    dispatch's position and (b) statistically independent of its siblings
    (sequential seeds like ``seed + i`` collide across requests and are
    correlated under some PRNGs). ``np.random.SeedSequence`` is exactly
    that contract — stable across numpy versions by documented guarantee —
    and returns plain ints, so the derivation is identical on whichever
    side of the HTTP link runs the windowing (the seed an in-process
    resolver folds for window batch ``i`` is the seed the remote client
    sends for window batch ``i``).
    """
    if seed < 0:
        # SeedSequence would raise a deep ValueError anyway; fail with the
        # contract every seeded endpoint shares (the server maps it to 400).
        raise ValueError(f"seed must be a non-negative integer (got {seed})")
    return int(np.random.SeedSequence(seed, spawn_key=path).generate_state(1)[0])


def grid_starts(size: int, patch: int, stride: int) -> List[int]:
    """Window start offsets covering ``[0, size)`` with the last one flush.

    ``stride`` windows from 0; if the regular grid stops short of the
    edge, one extra window is placed at ``size - patch`` (it overlaps its
    neighbor by more than the others — the feather blend handles the
    uneven overlap).
    """
    if patch <= 0 or stride <= 0:
        raise ValueError(f"patch and stride must be positive (got {patch}, {stride})")
    if patch > size:
        raise ValueError(f"patch {patch} exceeds image extent {size}")
    starts = list(range(0, size - patch + 1, stride))
    if starts[-1] != size - patch:
        starts.append(size - patch)
    return starts


def feather_profile(patch: int, overlap: int) -> np.ndarray:
    """1-D blend weights: linear ramps over ``overlap`` pixels, interior 1.

    Ramp values are strictly positive (1/(overlap+1) .. overlap/(overlap+1))
    so the normalizing accumulation in ``stitch`` never divides by zero,
    and symmetric so two neighbors' ramps sum to a constant across a
    standard-overlap seam.
    """
    if not 0 <= overlap <= patch // 2:
        raise ValueError(f"overlap must be in [0, patch//2] (got {overlap} for patch {patch})")
    w = np.ones(patch, np.float32)
    if overlap:
        ramp = np.arange(1, overlap + 1, dtype=np.float32) / (overlap + 1)
        w[:overlap] = ramp
        w[patch - overlap:] = ramp[::-1]
    return w


def stitch(
    patches: np.ndarray,
    starts: Sequence[Tuple[int, int]],
    out_hw: Tuple[int, int],
    overlap: int,
) -> np.ndarray:
    """Blend (N, p, p, C) window outputs into an (H, W, C) mosaic.

    Each window contributes ``feather_profile`` weights (outer product of
    the row/column profiles); the result is the per-pixel weighted mean,
    so image borders (covered once, at down-ramped weight) normalize back
    to exactly the single window's value.
    """
    patches = np.asarray(patches, np.float32)
    if patches.ndim != 4 or patches.shape[1] != patches.shape[2]:
        raise ValueError(f"patches must be (N, p, p, C), got {patches.shape}")
    if len(starts) != patches.shape[0]:
        raise ValueError(f"{patches.shape[0]} patches but {len(starts)} starts")
    p = patches.shape[1]
    prof = feather_profile(p, overlap)
    w = (prof[:, None] * prof[None, :])[..., None]
    num = np.zeros((*out_hw, patches.shape[-1]), np.float32)
    den = np.zeros((*out_hw, 1), np.float32)
    for (sh, sw), patch in zip(starts, patches):
        if sh < 0 or sw < 0 or sh + p > out_hw[0] or sw + p > out_hw[1]:
            raise ValueError(f"window at {(sh, sw)} falls outside {out_hw}")
        num[sh:sh + p, sw:sw + p] += w * patch
        den[sh:sh + p, sw:sw + p] += w
    if np.any(den == 0.0):
        raise ValueError("window grid leaves uncovered pixels")
    return num / den


class TileEndpoints:
    """Whole-raster endpoints over any batched ``super_resolve``.

    Subclass contract: ``self.window`` (LR window size in pixels — one
    model patch in LR space), ``self.normalize`` (whether tile inputs
    need the global min-max normalization), and
    ``self.super_resolve(batch, normalize=...)`` mapping an
    ``(B, window, window, C)`` LR batch to ``(B, 2*window, 2*window, C)``
    SR outputs. ``serve.SuperResolver`` provides the compiled on-device
    implementation; ``client.RemoteResolver`` posts the batches to a
    model server — the windowing/stitching below is identical either way.
    """

    # In-flight dispatch depth for the tile loops: JAX dispatch is async,
    # so keeping a few window batches in flight overlaps the device decode
    # and the device->host transfer of earlier batches with the dispatch of
    # later ones (a serial fetch-per-batch loop pays compute + transfer
    # end-to-end per batch). Bounded so a large raster's SR windows never
    # pile up on HBM. Remote resolvers opt into the same overlap by
    # exposing ``super_resolve_async`` / ``super_resolve_moments_async``
    # returning lazily-materialized results (``client.RemoteResolver``
    # posts on a thread pool) — without them a synchronous remote
    # super_resolve simply drains the pipeline with no benefit and no harm.
    _TILE_PIPELINE = 4

    def _dispatch_fn(self):
        """The batched SR dispatch for the pipelined loops: an async
        variant when the resolver has one (result materializes at fetch
        time), else the plain ``super_resolve``."""
        fn = getattr(self, "super_resolve_async", None)
        return fn if callable(fn) else self.super_resolve

    def _moments_hook(self):
        """The device-moments hook, if this resolver has one. The sync
        attribute is the capability switch (``None`` masks it — older
        servers, ``--no_moments`` A/B arms); only when it is live may the
        async variant take over the actual dispatching."""
        hook = getattr(self, "super_resolve_moments", None)
        if not callable(hook):
            return None
        fn = getattr(self, "super_resolve_moments_async", None)
        return fn if callable(fn) else hook

    def super_resolve_tile(
        self, y, overlap: Optional[int] = None, batch: int = 16,
        samples: int = 1, seed: Optional[int] = None,
    ) -> np.ndarray:
        """Arbitrary-size LR raster (H, W, C) -> seam-free SR (2H, 2W, C).

        The reference (and ``super_resolve``) only handles model-sized
        patches; this covers a whole tile: one normalization over the FULL
        raster (per-window min-max would shift brightness between
        windows), an overlapping window grid (``grid_starts``;
        ``overlap=None`` -> min(4, window//2)), fixed-shape batches
        through the compiled endpoint (every chunk is padded to ``batch``
        so one compile serves any tile size), and a feathered blend of the
        SR windows — overlap doubles in SR space (``stitch``).
        Rasters smaller than one window are reflect-padded up and cropped
        after. ``samples > 1`` averages that many posterior draws per
        window (an MMSE-flavored output whose extra smoothness also
        suppresses seam variance); (window, draw) pairs pack into the same
        fixed-shape batches, so extra draws cost dispatches proportional
        to ``samples / batch``, not ``samples``. ``seed`` makes the
        request reproducible: every window-batch dispatch derives its
        RNG from ``subseed(seed, batch_index)`` instead of the
        resolver's rolling state, so the same raster + seed + options
        yields the identical product on repeat calls and across
        processes (given the same resolver graph).
        """
        if samples < 1:
            raise ValueError(f"samples must be >= 1 (got {samples})")
        wins, starts, (h, w), (hp, wp), overlap = self._tile_windows(y, overlap)
        if samples == 1:
            sr_wins = self._tile_pass(wins, batch, seed=seed)
        else:
            sr_wins, _ = self._tile_draw_moments(wins, samples, batch,
                                                 seed=seed)
        out = stitch(
            sr_wins, [(2 * a, 2 * b) for a, b in starts],
            (2 * hp, 2 * wp), 2 * overlap,
        )
        return out[:2 * h, :2 * w]

    def uncertainty_tile(
        self, y, samples: int = 32, overlap: Optional[int] = None,
        batch: int = 16, seed: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Whole-raster posterior SR statistics: mean/std/variance maps.

        Same window grid as ``super_resolve_tile``; per-pixel first and
        second moments over ``samples`` draws are accumulated per window
        (packed batches — see ``_tile_draw_moments``), then each moment
        field is feather-stitched. The stitched variance
        ``blend(E[x^2]) - blend(E[x])^2`` is the variance of the blended
        posterior mixture: inside overlap bands it adds the between-window
        disagreement on top of the blended within-window variance (Jensen
        keeps it >= that blend, so it is never negative). ``seed`` makes
        the request reproducible (see ``super_resolve_tile``).
        """
        if samples < 2:
            raise ValueError(f"samples must be >= 2 (got {samples})")
        wins, starts, (h, w), (hp, wp), overlap = self._tile_windows(y, overlap)
        m1, m2 = self._tile_draw_moments(wins, samples, batch, seed=seed)
        starts_sr = [(2 * a, 2 * b) for a, b in starts]
        out_hw = (2 * hp, 2 * wp)
        mean = stitch(m1, starts_sr, out_hw, 2 * overlap)[:2 * h, :2 * w]
        e2 = stitch(m2, starts_sr, out_hw, 2 * overlap)[:2 * h, :2 * w]
        var = np.maximum(e2 - mean * mean, 0.0)
        return {"mean": mean, "std": np.sqrt(var), "variance": var}

    def iter_tile_rows(
        self,
        read_rows,
        height: int,
        width: int,
        overlap: Optional[int] = None,
        batch: int = 16,
        samples: int = 1,
        moments: bool = False,
        seed: Optional[int] = None,
        start_band: int = 0,
    ):
        """Streaming counterpart of the ``*_tile`` endpoints: a generator of
        finalized SR row bands over an arbitrarily tall raster, bounded
        memory (one window-row of LR input + ~one SR window-height of
        accumulation, independent of ``height``).

        ``read_rows(r0, r1)`` must return LR rows ``[r0, r1)`` as
        ``(rows, width, C)`` float32 **already normalized** the way the
        model expects (the caller owns the global min-max pass — per-band
        normalization would shift brightness between bands, the same
        reason ``super_resolve_tile`` normalizes once over the full
        raster). Yields ``(sr_row0, block)`` in order, where ``block`` is
        ``(rows, 2*width, C)`` float32 — or, with ``moments=True``, a dict
        of ``mean`` / ``std`` / ``variance`` blocks (the streamed form of
        ``uncertainty_tile``, same blended-mixture statistics). The window
        grid, feather weights and weighted-mean blend are identical to the
        in-memory endpoints, so on rasters that fit in memory the
        concatenated blocks reproduce ``super_resolve_tile`` /
        ``uncertainty_tile`` exactly (modulo the RNG draw order).
        ``seed`` makes the sweep reproducible: window-row ``k`` derives
        its dispatch seeds under ``subseed(seed, k)``, so re-running the
        same scene with the same seed and options yields the identical
        product (including after a resumed/partial sweep — a row's draws
        depend only on the request seed and its row index).

        ``start_band`` resumes a partial sweep: the first yield is band
        ``start_band`` (absolute — seeds and ``sr_row0`` keep their
        full-sweep values) and every yielded band is exact. Internally
        the sweep rebuilds the overlap accumulator from the earliest
        window-row that still reaches into the resumed band's SR rows —
        usually ``start_band - 1``, but the flush-tail window sits closer
        than the regular stride, so when its gap is smaller than the
        overlap an earlier window contributes too and more rows are
        recomputed (never yielded twice). With a ``seed`` the recomputed
        window draws are identical, so a resumed sweep reproduces the
        uninterrupted product bitwise.

        Rasters smaller than one model window in either dimension are not
        streamable (the in-memory endpoints reflect-pad them up; use
        those).
        """
        p = int(self.window)
        if height < p or width < p:
            raise ValueError(
                f"raster {height}x{width} is smaller than one {p}px model "
                f"window; use super_resolve_tile/uncertainty_tile"
            )
        if overlap is None:
            overlap = min(4, p // 2)
        if not 0 <= overlap <= p // 2:
            raise ValueError(f"overlap must be in [0, {p // 2}] (got {overlap})")
        if samples < (2 if moments else 1):
            raise ValueError(
                f"samples must be >= {2 if moments else 1} (got {samples})"
            )
        stride = p - overlap if overlap else p
        row_starts = grid_starts(height, p, stride)
        col_starts = grid_starts(width, p, stride)
        ps = 2 * p
        prof = feather_profile(ps, 2 * overlap)
        w2d = (prof[:, None] * prof[None, :])[..., None]

        if not 0 <= start_band < len(row_starts):
            raise ValueError(
                f"start_band {start_band} outside [0, {len(row_starts)})"
            )
        # Rebuild from the earliest window that still reaches into the
        # resumed band: window j covers SR rows [2*rs_j, 2*rs_j + 2p), so
        # it contributes iff rs_j + p > rs_start. With the regular stride
        # that is only j = start_band - 1, but the flush-tail window sits
        # (size - patch) % stride rows after its neighbor — when that gap
        # is smaller than the overlap, windows further back reach in too.
        first_win = start_band
        while (first_win > 0
               and row_starts[first_win - 1] + p > row_starts[start_band]):
            first_win -= 1
        base = 2 * row_starts[first_win]  # first SR row accumulated
        num1 = num2 = den = None  # accumulators cover SR rows [base, ...)

        def grown(buf, rows, chans):
            if buf is None:
                return np.zeros((rows, 2 * width, chans), np.float32)
            if rows > buf.shape[0]:
                pad = np.zeros((rows - buf.shape[0], 2 * width, buf.shape[2]),
                               np.float32)
                return np.concatenate([buf, pad])
            return buf

        for k in range(first_win, len(row_starts)):
            rs = row_starts[k]
            lr = np.asarray(read_rows(rs, rs + p), np.float32)
            if lr.ndim != 3 or lr.shape[:2] != (p, width):
                raise ValueError(
                    f"read_rows({rs}, {rs + p}) returned shape {lr.shape}, "
                    f"expected ({p}, {width}, C)"
                )
            wins = np.stack([lr[:, cs:cs + p] for cs in col_starts])
            row_seed = subseed(seed, k) if seed is not None else None
            if moments or samples > 1:
                m1, m2 = self._tile_draw_moments(wins, samples, batch,
                                                 seed=row_seed)
            else:
                m1, m2 = self._tile_pass(wins, batch, seed=row_seed), None
            top = 2 * rs + ps
            chans = m1.shape[-1]
            num1 = grown(num1, top - base, chans)
            den = grown(den, top - base, 1)
            if moments:
                num2 = grown(num2, top - base, chans)
            r_off = 2 * rs - base
            for j, cs in enumerate(col_starts):
                sl = (slice(r_off, r_off + ps), slice(2 * cs, 2 * cs + ps))
                num1[sl] += w2d * m1[j]
                den[sl] += w2d
                if moments:
                    num2[sl] += w2d * m2[j]
            flush_to = 2 * row_starts[k + 1] if k + 1 < len(row_starts) \
                else 2 * height
            n = flush_to - base
            if n <= 0:
                continue
            if k < start_band:
                # recomputed purely to rebuild the overlap accumulator:
                # slice the finalized rows off without yielding them
                num1, den, base = num1[n:], den[n:], flush_to
                if moments:
                    num2 = num2[n:]
                continue
            mean = num1[:n] / den[:n]
            if moments:
                e2 = num2[:n] / den[:n]
                var = np.maximum(e2 - mean * mean, 0.0)
                yield base, {"mean": mean, "std": np.sqrt(var),
                             "variance": var}
                num2 = num2[n:]
            else:
                yield base, mean
            num1, den, base = num1[n:], den[n:], flush_to

    # ------------------------------------------------------ tile plumbing
    def _tile_windows(self, y, overlap: Optional[int]):
        """Normalize a raster once, cover it with the overlapping window
        grid: (N, p, p, C) windows + starts + original/padded HW + the
        resolved overlap. All host-side numpy — the raster never touches
        the device until the windows go through the compiled endpoint
        (min-max + pad are trivial next to a full-raster transfer on a
        remote link)."""
        y = np.asarray(y, np.float32)
        if y.ndim == 4:
            if y.shape[0] != 1:
                raise ValueError("tile endpoints serve one raster per call")
            y = y[0]
        if y.ndim != 3:
            raise ValueError(f"expected (H, W, C) raster, got shape {y.shape}")
        p = int(self.window)
        if overlap is None:
            overlap = min(4, p // 2)
        if not 0 <= overlap <= p // 2:
            raise ValueError(f"overlap must be in [0, {p // 2}] (got {overlap})")
        if self.normalize:
            # host mirror of utils.image.normalize_image (same formula)
            mn = y.min(axis=(0, 1), keepdims=True)
            mx = y.max(axis=(0, 1), keepdims=True)
            y = (y - mn) / (mx - mn + 1e-5)
        h, w = y.shape[:2]
        pad_h, pad_w = max(0, p - h), max(0, p - w)
        if pad_h or pad_w:
            y = np.pad(y, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        hp, wp = y.shape[:2]
        stride = p - overlap if overlap else p
        starts = [
            (sh, sw)
            for sh in grid_starts(hp, p, stride)
            for sw in grid_starts(wp, p, stride)
        ]
        wins = np.stack([y[a:a + p, b:b + p] for a, b in starts])
        return wins, starts, (h, w), (hp, wp), overlap

    def _tile_pass(self, wins: np.ndarray, batch: int,
                   seed: Optional[int] = None) -> np.ndarray:
        """One posterior draw for every window, in fixed-shape batches
        (ragged last chunk padded so one compile serves any tile size);
        dispatches ride ``_TILE_PIPELINE`` deep before the oldest is
        fetched. ``seed`` pins dispatch ``j``'s RNG to ``subseed(seed, j)``
        (the seed kwarg is only forwarded when set, so resolvers that
        predate per-request seeds keep working unseeded)."""
        if batch < 1:
            raise ValueError(f"batch must be >= 1 (got {batch})")
        from collections import deque

        dispatch = self._dispatch_fn()
        pending: deque = deque()
        outs = []

        def fetch():
            # slice the pad off ON DEVICE so the ragged chunk's padding
            # never crosses the (slow) device->host link
            sr, short = pending.popleft()
            outs.append(np.asarray(sr[:sr.shape[0] - short] if short else sr))

        for j, i in enumerate(range(0, len(wins), batch)):
            chunk = wins[i:i + batch]
            short = batch - len(chunk)
            if short:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], short, axis=0)]
                )
            kw = {} if seed is None else {"seed": subseed(seed, j)}
            pending.append(
                (dispatch(chunk, normalize=False, **kw), short)
            )
            if len(pending) >= self._TILE_PIPELINE:
                fetch()
        while pending:
            fetch()
        return np.concatenate(outs)

    def _tile_draw_moments(
        self, wins: np.ndarray, samples: int, batch: int,
        seed: Optional[int] = None,
    ) -> tuple:
        """Per-window first/second per-pixel sample moments over
        ``samples`` posterior draws.

        Resolvers that can reduce draws on device expose a
        ``super_resolve_moments(wins, samples) -> (s1, s2)`` hook
        (``serve.SuperResolver`` does; a ``seed`` kwarg is forwarded only
        when the request is seeded); then each window batch is ONE
        dispatch returning two moment maps — ceil(N/batch) dispatches and
        2*N window-images over the link, independent of ``samples``.

        Without the hook (remote/artifact resolvers), every draw crosses
        the link: the (window, draw) work list is window-major and packs
        into fixed-shape batches — ceil(N*samples/batch) dispatches, not
        samples*ceil(N/batch), since a free batch slot might as well
        carry the next window's draw. Slots past the end repeat the last
        window and are dropped from the sums."""
        if batch < 1:
            raise ValueError(f"batch must be >= 1 (got {batch})")
        from collections import deque

        hook = self._moments_hook()
        if hook is not None:
            n = len(wins)
            s1 = s2 = None
            pending: deque = deque()

            def fetch_moments():
                nonlocal s1, s2
                (m1, m2), i0, valid = pending.popleft()
                # device-side slice: padding past `valid` never transfers
                m1 = np.asarray(m1[:valid], dtype=np.float32)
                m2 = np.asarray(m2[:valid], dtype=np.float32)
                if s1 is None:
                    s1 = np.zeros((n, *m1.shape[1:]), np.float32)
                    s2 = np.zeros_like(s1)
                s1[i0:i0 + valid] = m1
                s2[i0:i0 + valid] = m2

            for j, i in enumerate(range(0, n, batch)):
                chunk = wins[i:i + batch]
                valid = len(chunk)
                if valid < batch:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], batch - valid, axis=0)]
                    )
                kw = {} if seed is None else {"seed": subseed(seed, j)}
                pending.append((hook(chunk, samples, **kw), i, valid))
                if len(pending) >= self._TILE_PIPELINE:
                    fetch_moments()
            while pending:
                fetch_moments()
            return s1 / samples, s2 / samples

        n = len(wins)
        total = n * samples
        dispatch = self._dispatch_fn()
        s1 = s2 = None
        pending: deque = deque()

        def fetch():
            nonlocal s1, s2
            sr_dev, idx, valid = pending.popleft()
            # device-side slice: padding past `valid` never transfers
            if valid < sr_dev.shape[0]:
                sr_dev = sr_dev[:valid]
            sr = np.asarray(sr_dev, dtype=np.float32)
            if s1 is None:
                s1 = np.zeros((n, *sr.shape[1:]), np.float32)
                s2 = np.zeros_like(s1)
            np.add.at(s1, idx[:valid], sr)
            np.add.at(s2, idx[:valid], sr ** 2)

        for j, i in enumerate(range(0, total, batch)):
            idx = np.minimum(np.arange(i, i + batch) // samples, n - 1)
            kw = {} if seed is None else {"seed": subseed(seed, j)}
            pending.append((
                dispatch(wins[idx], normalize=False, **kw),
                idx, min(batch, total - i),
            ))
            if len(pending) >= self._TILE_PIPELINE:
                fetch()
        while pending:
            fetch()
        return s1 / samples, s2 / samples
