"""Roofline / speed-of-light accounting for the flagship MCTS pass and train
step (r2 VERDICT weak #4: 'no roofline/MFU accounting, so fast is asserted
relative to round 1, not to the hardware').

Pure host-side arithmetic from shapes and dtypes — no jax. Pair the printed
bytes/FLOPs with measured per-scope times (scripts/trace_multi.py /
archive/measure_round3.py) to get achieved fractions of peak.

v5e peaks (public): 197 TFLOP/s bf16 MXU, ~394 TFLOP/s int8, 819 GB/s HBM.
"""
import json

HBM = 819e9  # B/s
MXU_BF16 = 197e12  # FLOP/s


def fmt(b):
    return f"{b/1e6:8.1f}MB"


def pass_accounting(B=16384, T=64, A=81, S=2, K=8, n_iters=6, grow=False):
    """Bytes moved by one multi-leaf pass (simulate_multi), by stage.

    `grow` divides node-axis streams by ~T/avg(R_p) (triangular passes).
    Streams assume perfect fusion: every operand read once per consumer
    group, outputs written once. Real XLA re-materializes some — the gap IS
    the optimization target.
    """
    rows = T if not grow else (sum(min(T, 1 + (p + 1) * K) for p in range(8)) / 8)
    f32, bf16, i8 = 4, 2, 1
    nta_f32 = B * rows * A * f32
    nta_bf16 = B * rows * A * bf16
    nta_i8 = B * rows * A * i8
    nt_f32 = B * rows * f32

    stages = {}
    # solve: read logits/n_edge (bf16) + w_edge (f32) once to form pi,q;
    # n_iters Halley iterations each stream pi,q (f32) + alpha (B,T)
    stages["solve"] = {
        "read": 2 * nta_bf16 + nta_f32 + n_iters * 2 * nta_f32,
        "write": nta_f32,  # probs
    }
    # sample (matmul cum): read probs, write cum, one stacked K-compare read
    # of cum, K child lookups re-reading int8 children
    stages["sample"] = {
        "read": nta_f32 + nta_f32 + K * nta_i8,
        "write": nta_f32 + K * B * rows * 4 * 2,  # cum + acts/childs i32
    }
    # walk: L levels of (B,) gathers from (B,rows) acts/nxt — tiny
    L = 9 if not grow else 5.5
    stages["walk"] = {"read": K * L * nt_f32, "write": K * B * 4 * 3}
    # gather+envstep+eval inputs: worlds board (i8) gathered via one-hot
    # contraction (streams full (B,rows,81) once) + K*B obs build + eval acts
    stages["gather/step"] = {
        "read": B * rows * A * i8 + K * B * A * (i8 + bf16 * 2),
        "write": K * B * A * (i8 + bf16 * 2),
    }
    # writes: set_rows streams each (B,rows,...) tree leaf once (read+write)
    leaf_bytes = (
        B * rows * A * (i8 + bf16)  # children + logits
        + B * rows * A * i8  # worlds.board
        + B * rows * (4 + 4 + 1 + 2 * 4 + 2 * 4)  # parents/rel/term/rew/v
    )
    stages["writes"] = {"read": leaf_bytes, "write": leaf_bytes}
    # backup: edge deltas d_ne/d_w (B,rows,A) f32 built from (B,K*L,*) one-
    # hots, then read+write n_edge/w_edge/n/w
    stages["backup"] = {
        "read": 2 * nta_f32 + nta_bf16 + 2 * nt_f32,
        "write": 2 * nta_f32 + nta_bf16 + 2 * nt_f32,
    }
    return stages


def eval_flops(B=16384, K=8, width=512, depth=4, A=81):
    params = 2 * A * width + depth * width * width + width * (A + 1)
    return 2 * K * B * params


def main():
    print("== flagship pass (16k envs, 9x9, 64 nodes, K=8) ==")
    for mode in (False, True):
        stages = pass_accounting(grow=mode)
        tot = 0
        print(f"\n-- {'grow (triangular)' if mode else 'scan (rectangular)'} --")
        for name, s in stages.items():
            b = s["read"] + s["write"]
            tot += b
            print(f"{name:12s} {fmt(b)}  SoL {1e3*b/HBM:6.2f} ms")
        ev = eval_flops()
        ev_ms = 1e3 * ev / MXU_BF16
        print(f"{'eval (MXU)':12s} {ev/1e9:7.1f}GF  SoL {ev_ms:6.2f} ms")
        sol = 1e3 * tot / HBM + ev_ms
        # 8 passes x K*B sims per 64-node search at B envs
        sims_sol = 8 * 16384 / (sol / 1e3)
        print(f"{'TOTAL':12s} {fmt(tot)}  speed-of-light {sol:6.2f} ms/pass"
              f" -> {sims_sol:,.0f} sims/s")


if __name__ == "__main__":
    main()
