"""Static routing engine: arbitrary permutations at vector rate on TPU.

Why this exists
---------------
A TPU v5e can gather at vector rate only *within a 128-lane window*
(``take_along_axis`` along lanes -> one VPU dynamic-gather op; measured 74
Gelem/s HBM-bound) or, via 8 gathers + selects, within a 1024-element
window (29 Gelem/s).  Any wider gather — XLA ``jnp.take`` included — runs
at scalar rate (0.15 Gelem/s measured; see experiments/probe_gather.py and
docs/DESIGN.md).  SpMV needs the arbitrary gather ``x[cols]`` — the same
random-access wall the reference CVR format exists to feed on KNL, where
AVX-512 at least has a hardware vector gather (`_mm512_i32logather_pd`,
reference spmv.cpp:1227).  The TPU VPU has none.

But in sparse linear algebra the *indices are static*: the matrix is fixed
across thousands of SpMV calls; only ``x`` changes.  Any static permutation
of N elements can therefore be compiled, ahead of time, into a fixed
sequence of operations the TPU *is* fast at:

  1. view the stream as a (T, 1024) grid of tiles;
  2. permute within each source tile        (window-1024 gather, 29+ G/s)
  3. transpose the grid                      (XLA relayout, ~HBM rate)
  4. permute within each row of length T     (window gathers, VPU rate)
  5. transpose back                          (~HBM rate)
  6. permute within each dest tile           (window-1024 gather)

Steps 2/4/6 are the three stages of a Clos/Benes network; the routing
assignment — which intermediate "color" q in [0,1024) each element takes —
must satisfy: within every source tile all colors are distinct, and within
every dest tile all colors are distinct.  That is exactly a proper
1024-edge-coloring of the bipartite multigraph (source tiles) x (dest
tiles) with one edge per element.  The padded graph is 1024-regular, and by
König's theorem a Δ-regular bipartite multigraph is Δ-edge-colorable; with
Δ a power of two the coloring is constructed by recursive Euler splitting
(10 levels, O(N) each) — see ``euler_color`` here and the native C++
implementation in native/cvr_native.cpp.

In the SpMV pipeline stages 2 and 6 are *fused into the neighbouring
passes* (the expand producer and the reduce consumer) by composing their
index planes at pack time, so a routed gather costs one middle pass plus
two transposes on top of the unavoidable stream traffic.

Physical layout convention: a logical (T, 1024) grid is stored as an
(T*8, 128) array — tile t occupies rows [8t, 8t+8), i.e. one aligned
(8, 128) VPU tile — so every within-tile permutation is an in-register
shuffle and no relayout is ever implicit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

TILE = 1024  # elements per routing tile = one (8, 128) f32 VPU tile
SUB = 128  # lanes


def euler_color_py(
    src: np.ndarray, dst: np.ndarray, n_tiles: int, k: int = TILE
) -> np.ndarray:
    """1024-edge-coloring of a k-regular bipartite multigraph, pure Python.

    ``src[i]``/``dst[i]`` are the endpoint tile ids of edge i; every source
    tile and every dest tile must have exactly ``k`` incident edges, k a
    power of two.  Returns ``color[i] in [0, k)`` such that no two edges
    sharing a source tile or a dest tile have the same color.

    Algorithm: recursive Euler splitting.  All degrees are even, so the
    multigraph decomposes into closed walks; orienting each walk and
    assigning alternate edges to the two halves splits every vertex degree
    exactly in half (walks in a bipartite graph have even length).  k is a
    power of two, so log2(k) levels terminate with perfect matchings =
    color classes.  Reference implementation for tests; the O(N log k)
    native version lives in native/cvr_native.cpp (same algorithm).
    """
    E = src.shape[0]
    if E != n_tiles * k:
        raise ValueError(f"edges {E} != n_tiles*k {n_tiles * k}")
    if k & (k - 1):
        raise ValueError("k must be a power of two")
    color = np.zeros(E, dtype=np.int32)

    def split(edge_ids: np.ndarray, kk: int, base: int) -> None:
        if kk == 1:
            color[edge_ids] = base
            return
        # Build incidence lists over combined vertex set: u in [0, n),
        # v in [n, 2n).  Each vertex has kk incident edges here.
        m = edge_ids.shape[0]
        u = src[edge_ids]
        v = dst[edge_ids] + n_tiles
        # adjacency: for each vertex, list of (local edge idx)
        deg = np.zeros(2 * n_tiles, dtype=np.int64)
        np.add.at(deg, u, 1)
        np.add.at(deg, v, 1)
        off = np.zeros(2 * n_tiles + 1, dtype=np.int64)
        np.cumsum(deg, out=off[1:])
        adj = np.empty(2 * m, dtype=np.int64)
        cur = off[:-1].copy()
        for i in range(m):
            adj[cur[u[i]]] = i
            cur[u[i]] += 1
            adj[cur[v[i]]] = i
            cur[v[i]] += 1
        ptr = off[:-1].copy()  # per-vertex scan pointer into adj
        used = np.zeros(m, dtype=bool)
        side = np.zeros(m, dtype=bool)  # False -> half A, True -> half B
        other = np.empty(m, dtype=np.int64)  # other endpoint given one
        for start in range(m):
            if used[start]:
                continue
            # Walk a closed trail starting along edge `start` from its
            # u endpoint; alternate sides by traversal direction
            # (u->v = A, v->u = B).
            e = start
            vert = u[start]
            while True:
                used[e] = True
                frm_u = vert < n_tiles
                side[e] = not frm_u
                vert = v[e] if frm_u else u[e]
                # find next unused edge at `vert`
                p = ptr[vert]
                nxt = -1
                while p < off[vert + 1]:
                    cand = adj[p]
                    if not used[cand]:
                        nxt = cand
                        break
                    p += 1
                ptr[vert] = p
                if nxt < 0:
                    break  # trail closed (degrees even => back at start)
                e = nxt
        a = edge_ids[~side]
        b = edge_ids[side]
        split(a, kk // 2, base)
        split(b, kk // 2, base + kk // 2)

    split(np.arange(E, dtype=np.int64), k, 0)
    return color


def euler_color(
    src: np.ndarray, dst: np.ndarray, n_tiles: int, k: int = TILE
) -> np.ndarray:
    """Native C++ coloring when available, Python fallback otherwise."""
    from cvr_tpu import _native

    if _native.available() and hasattr(_native, "euler_color_native"):
        return _native.euler_color_native(
            np.ascontiguousarray(src, dtype=np.int32),
            np.ascontiguousarray(dst, dtype=np.int32),
            int(n_tiles),
            int(k),
        )
    return euler_color_py(src, dst, n_tiles, k)


@dataclass
class RoutePlan:
    """Compiled static permutation ``out[i] = v[perm[i]]`` (bijection).

    Index planes are gather-form and live in the (T*8, 128) physical
    layout (logical (T, 1024)):

      s1    [T, 1024] int16: g1[a, q]     = v_grid[a, s1[a, q]]
      mid   [1024, T] int32: g2[q, d]     = g1t[q, mid[q, d]]
      s3    [T, 1024] int16: out_grid[d, o] = g2t[d, s3[d, o]]

    ``n`` is the real (unpadded) length; positions >= n are don't-care.
    """

    s1: np.ndarray
    mid: np.ndarray
    s3: np.ndarray
    n: int

    @property
    def n_tiles(self) -> int:
        return self.s1.shape[0]


def plan_route(
    perm: np.ndarray, n: int | None = None, tile_multiple: int = 1
) -> RoutePlan:
    """Compile a bijection into a 3-stage Clos route.

    ``perm``: int array, out[i] = v[perm[i]]; must be a permutation of
    [0, len(perm)).  The stream is padded to ``tile_multiple`` tiles of
    1024 with identity tail positions (tile_multiple=1024 enables the
    recursive middle stage, plan_mid_recursive).
    """
    perm = np.asarray(perm, dtype=np.int64)
    n = int(perm.shape[0]) if n is None else n
    N = perm.shape[0]
    T = max(1, -(-N // TILE))
    T = -(-T // tile_multiple) * tile_multiple
    Np = T * TILE
    full = np.arange(Np, dtype=np.int64)
    full[:N] = perm
    # pad: remaining positions map to themselves (identity) — valid only
    # if perm stays within [0, N) and N == Np or the tail is untouched.
    if N != Np:
        # tail positions [N, Np) map identically; they are don't-care.
        pass

    perm32 = full.astype(np.int32)

    from cvr_tpu import _native

    if _native.available() and hasattr(_native, "euler_color_perm_native"):
        # dst(i) = i >> 10 is implicit; no edge arrays materialized.
        colors = _native.euler_color_perm_native(perm32, T)
        s1, mid, s3 = _native.route_planes_native(perm32, colors, T)
        return RoutePlan(s1=s1, mid=mid, s3=s3, n=n)

    src_tile = perm32 >> 10  # source tile of the element destined to i
    d_of_edge = np.repeat(np.arange(T, dtype=np.int32), TILE)
    colors = euler_color(src_tile, d_of_edge, T, TILE)

    # stage 1: within source tile a, the element with color q sits at
    # in-tile offset (perm[i] % TILE).  s1[a, q] = that offset.
    s1 = np.empty((T, TILE), dtype=np.int16)
    s1[src_tile, colors] = (perm32 & 1023).astype(np.int16)
    # middle: g1t[q, a] holds color-q element of source tile a; its dest
    # tile is d.  mid[q, d] = a.  (int32: tile ids are unbounded by the
    # int16 range — only the device planes must be int16, and in the
    # recursive decomposition they hold within-chunk offsets < 1024.)
    mid = np.empty((TILE, T), dtype=np.int32)
    mid[colors, d_of_edge] = src_tile.astype(np.int32)
    # stage 3: out position i (tile d, offset o) receives the color-q
    # element routed to tile d.  s3[d, o] = q.
    s3 = np.empty((T, TILE), dtype=np.int16)
    s3[d_of_edge, np.arange(Np) & 1023] = colors.astype(np.int16)
    return RoutePlan(s1=s1, mid=mid, s3=s3, n=n)


def apply_route_numpy(plan: RoutePlan, v: np.ndarray) -> np.ndarray:
    """Reference executor (the spec the TPU kernels are tested against)."""
    T = plan.n_tiles
    Np = T * TILE
    g = np.zeros(Np, dtype=v.dtype)
    g[: v.shape[0]] = v
    grid = g.reshape(T, TILE)
    g1 = np.take_along_axis(grid, plan.s1.astype(np.int64), axis=1)
    g1t = g1.T.copy()  # [1024, T]
    g2 = np.take_along_axis(g1t, plan.mid.astype(np.int64), axis=1)
    g2t = g2.T.copy()  # [T, 1024]
    out = np.take_along_axis(g2t, plan.s3.astype(np.int64), axis=1)
    return out.reshape(-1)[: plan.n]


# ---------------------------------------------------------------------------
# Recursive (two-level Benes) middle stage
# ---------------------------------------------------------------------------
#
# The middle stage permutes within rows of length T.  Executed brutely it
# costs O(T/128) vector ops per element; for web-scale T (~7000) that pass
# dominates the whole SpMV.  Decompose each row's permutation, viewing the
# row as a (Tk, 1024) grid of chunks (Tk = T/1024):
#
#   M1: permute within each source chunk  -> position = chunk color m
#   M2: move across chunks at fixed m     -> Tk-way select (cheap)
#   M3: permute within each dest chunk    -> final in-row position
#
# M1/M3 are within-1024 tile permutations (the fast tileperm kernel); the
# chunk color m is a second-level Euler coloring, one independent
# 1024-regular bipartite multigraph per row (Tk nodes per side).


def plan_mid_recursive(plan: RoutePlan):
    """Decompose plan.mid into (m1, csel, m3) planes (see
    mid_recursive_planes)."""
    return mid_recursive_planes(plan.mid, plan.n_tiles)


def mid_recursive_planes(mid_arr, T: int):
    """Decompose a (1024, T) mid array into (m1, csel, m3) planes;
    requires T % 1024 == 0.

    Returns logical planes, all shaped [Tk*1024, 1024] except csel:
      m1[ca*1024 + q, m]   = within-chunk source offset (a & 1023)
      csel[cd*1024 + q, m] = source chunk ca
      m3[cd*1024 + q, f]   = chunk color m of the element ending at f
    """
    mid = np.ascontiguousarray(mid_arr, dtype=np.int32)  # [1024, T]
    if T % TILE:
        raise ValueError("recursive middle requires T % 1024 == 0")
    Tk = T // TILE
    if Tk == 1:
        return None  # caller uses a single tileperm over rows

    from cvr_tpu import _native

    native_ok = _native.available() and hasattr(
        _native, "mid_planes_native"
    )
    if native_ok:
        # Capacitated coloring on the aggregated Tk x Tk multiplicity
        # matrix per row: even capacities split arithmetically; only odd
        # entries walk.  O(entries) per level instead of O(edges).
        colors = _native.color_rows_cap_native(mid, T, Tk)
        m1, csel, m3 = _native.mid_planes_native(mid, T, colors)
        return {"m1": m1, "csel": csel, "m3": m3, "Tk": Tk}

    a = mid.astype(np.int64)  # [1024, T]: source tile per (q, d)
    d = np.broadcast_to(np.arange(T, dtype=np.int64), (TILE, T))
    ca = (a >> 10).astype(np.int32)
    cd = (d >> 10).astype(np.int32)
    colors = np.empty((TILE, T), dtype=np.int32)
    for q in range(TILE):
        colors[q] = euler_color_py(ca[q], cd[q], Tk, TILE)

    q_grid = np.broadcast_to(
        np.arange(TILE, dtype=np.int64)[:, None], (TILE, T)
    )
    m = colors.astype(np.int64)
    m1 = np.empty((Tk * TILE, TILE), dtype=np.int16)
    m1[ca.astype(np.int64) * TILE + q_grid, m] = (a & 1023).astype(np.int16)
    csel = np.empty((Tk * TILE, TILE), dtype=np.int16)
    csel[cd.astype(np.int64) * TILE + q_grid, m] = ca.astype(np.int16)
    m3 = np.empty((Tk * TILE, TILE), dtype=np.int16)
    m3[cd.astype(np.int64) * TILE + q_grid, (d & 1023)] = m.astype(np.int16)
    return {"m1": m1, "csel": csel, "m3": m3, "Tk": Tk}
