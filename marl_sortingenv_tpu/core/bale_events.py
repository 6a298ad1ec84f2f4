"""Host-side reconstruction for the fastb event-log bale mode.

With ``cfg.bale_mode == "events"`` the batch-last engine (``core.fastb``)
does not materialize the (5, MAX_BALES, N) bale ring buffers every step.
Instead each finished press emits one compact event ``(material, amount,
quality)`` into an (E, N) log, E = ``cfg.max_press_events`` (~32 for the
reference episode length) — ~20x less HBM traffic on the hottest write
path of the step, with zero information loss: the exact bale lists of the
reference (``env_super.py:661-687`` — full bales of ``bale_standard_size``,
the >threshold remainder as its own bale, the small remainder merged into
the last bale) are a deterministic replay of the event sequence, performed
here on host when a consumer (dashboard, checksum, conservation audit)
actually needs them.

Replay semantics mirror ``core.fast._press_bale`` exactly (which itself
is the array form of reference ``press_bale``); ``test_bale_events.py``
asserts bitwise equality of the reconstruction against a full-mode
rollout driven by identical RNG keys.
"""

from __future__ import annotations

import numpy as np

from ..config.config import SimConfig

__all__ = ["rebuild_bales", "events_to_full"]


def rebuild_bales(cfg: SimConfig, ev_mat, ev_n, ev_q, ev_cnt,
                  max_bales: int | None = None):
    """Replay press events into dense bale buffers.

    Args are the event-log leaves of a fastb ``BState`` (batch-last:
    ``ev_mat/ev_n/ev_q`` i16[E, N], ``ev_cnt`` i32[N]).  Returns
    ``(bale_size i16[5, MAX, N], bale_qual i16[5, MAX, N],
    bale_cnt i32[5, N])`` — the exact arrays a ``bale_mode="full"``
    rollout with the same stream would have produced.
    """
    ev_mat = np.asarray(ev_mat)
    ev_n = np.asarray(ev_n).astype(np.int64)
    ev_q = np.asarray(ev_q)
    ev_cnt = np.asarray(ev_cnt)
    E, N = ev_n.shape
    if np.any(ev_cnt > E):
        raise ValueError(
            f"event log overflow: max ev_cnt {int(ev_cnt.max())} > capacity "
            f"{E}; raise cfg.max_press_events")
    MAX = max_bales if max_bales is not None else cfg.max_bales
    bs = cfg.effective_balesize
    thresh = float(bs) * float(cfg.bale_remainder_threshold)

    bale_size = np.zeros((5, MAX, N), np.int16)
    bale_qual = np.zeros((5, MAX, N), np.int16)
    bale_cnt = np.zeros((5, N), np.int32)

    for i in range(N):
        for e in range(int(ev_cnt[i])):
            m = int(ev_mat[e, i])
            n = int(ev_n[e, i])
            q = ev_q[e, i]
            full, rem = divmod(n, bs)
            c = bale_cnt[m, i]
            if full:
                bale_size[m, c:c + full, i] = bs
                bale_qual[m, c:c + full, i] = q
                c += full
            if rem > 0:
                # reference env_super.py:674-684: big remainder (or empty
                # list) becomes its own bale, small remainder merges into
                # the last bale (quality of the last bale is kept).
                if rem > thresh or c == 0:
                    bale_size[m, c, i] = rem
                    bale_qual[m, c, i] = q
                    c += 1
                else:
                    bale_size[m, c - 1, i] += rem
            bale_cnt[m, i] = c
    return bale_size, bale_qual, bale_cnt


def events_to_full(cfg: SimConfig, st):
    """Convert an event-mode fastb ``BState`` into full-bale mode.

    Returns a state whose ``bale_size/bale_qual/bale_cnt`` are populated
    (and ``ev_*`` leaves cleared to ``None``), suitable for
    ``fastb.to_batch_first`` / the dashboard / the conservation audit.
    """
    import jax.numpy as jnp

    if st.ev_cnt is None:
        return st  # already full mode
    size, qual, cnt = rebuild_bales(cfg, st.ev_mat, st.ev_n, st.ev_q,
                                    st.ev_cnt)
    return st._replace(
        bale_size=jnp.asarray(size), bale_qual=jnp.asarray(qual),
        bale_cnt=jnp.asarray(cnt),
        ev_mat=None, ev_n=None, ev_q=None, ev_cnt=None)
