"""FMI: flow-model interface — the flow fields transport runs on.

Behavioral parity target: src/Model/TransportModel/FlowModelInterface.f90
(:28-30, 255-266) + tsp-fmi.f90: provides gwfflowja, gwfsat, storage rates
and boundary flows to the transport packages, either linked in-memory from
a GWF model solved in the same simulation (our default) or read back from
budget/head files (offline mode, via utils.binary readers).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["q_edge", "sat", "sat_old", "strg_ss", "strg_sy",
                      "bound_q", "bound_node", "bound_mask", "bound_conc",
                      "cim"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class FlowFields:
    """Flow solution snapshot for one transport time step.

    q_edge: f64[E] volumetric flow for each symmetric-half edge (n<m),
            positive into cell n (the reference's gwfflowja convention for
            the (n,m) entry).
    sat / sat_old: f64[N] cell saturations at new/old time level.
    strg_ss / strg_sy: f64[N] storage rates (reference gwfstrgss/gwfstrgsy).
    bound_*: concatenated boundary flows of all GWF stress packages incl.
             constant-head cells (q positive into the aquifer) with the SSM
             source concentration for each entry — the inputs of ssm_fc.
    """

    q_edge: jax.Array
    sat: jax.Array
    sat_old: jax.Array
    strg_ss: jax.Array
    strg_sy: jax.Array
    bound_q: jax.Array
    bound_node: jax.Array
    bound_mask: jax.Array
    bound_conc: jax.Array
    # immobile-domain concentration state at start of step (IST package);
    # rides the per-step pytree like the flow fields
    cim: object = None


def from_gwf_step(gwf_model, head, head_old, ibound, cond, delt, iss,
                  pkgs=None, ssm_spec=None):
    """Build FlowFields from a solved GWF time step (in-memory coupling).

    ``ssm_spec``: dict package-name → source concentration (scalar or
    per-entry array); packages not listed get 0.0 (reference SSM default).
    Constant-head flows are included (computed from the flowja residual at
    CHD cells) so solute leaves/enters through CHD boundaries.
    """
    from ..gwf import npf as npf_mod

    q_edge = gwf_model.edge_flows(head, ibound, cond, pkgs)
    opts, arrays = gwf_model.npf_opts, gwf_model.npf_arrays
    sat = npf_mod.compute_saturation(opts, arrays, head, ibound)
    sat_old = npf_mod.compute_saturation(opts, arrays, head_old, ibound)

    N = gwf_model.nodes
    if gwf_model.sto_arrays is not None and not iss:
        from ..gwf import sto as sto_mod
        from ...ops.smoothing import quadratic_saturation
        from ...ops.storage import ss_capacity, ss_terms, sy_capacity, sy_terms
        o, a = gwf_model.sto_opts, gwf_model.sto_arrays
        tled = 1.0 / delt
        is_conv = a.iconvert != 0
        snold = jnp.where(is_conv, quadratic_saturation(a.top, a.bot, head_old,
                                                        o.satomega), 1.0)
        snnew = jnp.where(is_conv, quadratic_saturation(a.top, a.bot, head,
                                                        o.satomega), 1.0)
        rho1 = ss_capacity(o.istor_coef, a.top, a.bot, a.area, a.ss) * tled
        aterm, rhsterm = ss_terms(a.iconvert, o.iorig_ss, o.iconf_ss, a.top,
                                  a.bot, rho1, rho1, snnew, snold, head,
                                  head_old)
        act = ibound >= 1
        strg_ss = jnp.where(act, aterm * head - rhsterm, 0.0)
        rho2 = sy_capacity(a.area, a.sy) * tled
        tthk = a.top - a.bot
        strg_sy = jnp.where(act & is_conv,
                            rho2 * tthk * snold - rho2 * tthk * snnew, 0.0)
    else:
        strg_ss = jnp.zeros(N)
        strg_sy = jnp.zeros(N)

    # boundary flows for SSM
    flows = gwf_model.boundary_budget(head, ibound, pkgs)
    ssm_spec = ssm_spec or {}
    qs, nodes, masks, concs = [], [], [], []
    if pkgs is None:
        pkgs = gwf_model.packages

    def add(name, q, node, mask):
        qs.append(q)
        nodes.append(node)
        masks.append(mask)
        spec = ssm_spec.get(name, 0.0)
        concs.append(jnp.broadcast_to(jnp.asarray(spec, jnp.float64),
                                      q.shape))

    for name, q in flows.items():
        if q is None:
            continue
        pdata = getattr(pkgs, name.lower(), None)
        if pdata is None:
            continue
        add(name, q, pdata.node, pdata.mask)

    # constant-head flows from the flowja residual at CHD cells
    if pkgs.chd is not None:
        dtopo = gwf_model.dtopo
        into = jnp.zeros(N)
        into = into.at[dtopo.edge_n].add(q_edge)
        into = into.at[dtopo.edge_m].add(-q_edge)
        q_chd = jnp.where(pkgs.chd.mask, -into[pkgs.chd.node], 0.0)
        add("CHD", q_chd, pkgs.chd.node, pkgs.chd.mask)

    if qs:
        bound_q = jnp.concatenate(qs)
        bound_node = jnp.concatenate(nodes)
        bound_mask = jnp.concatenate(masks)
        bound_conc = jnp.concatenate(concs)
    else:
        bound_q = jnp.zeros(1)
        bound_node = jnp.zeros(1, jnp.int32)
        bound_mask = jnp.zeros(1, bool)
        bound_conc = jnp.zeros(1)
    return FlowFields(q_edge, sat, sat_old, strg_ss, strg_sy,
                      bound_q, bound_node, bound_mask, bound_conc)


def fields_from_files(gwf_model, hds_path, cbc_path, ssm_spec=None):
    """Offline FMI: rebuild per-step FlowFields from a prior flow run's
    .hds + .cbc output files (reference FlowModelInterface.f90:255-266
    budget/head file mode; tests test_gwt_*fmi*.py pattern).

    Returns a list of (kstp, kper, delt, FlowFields).  Saturations are
    recomputed from the file heads with the GWF model's NPF arrays;
    storage rates come from the STO-SS/STO-SY imeth=6 records; boundary
    flows from the per-package imeth=6 records with SSM concentrations
    applied per package name.
    """
    import numpy as np
    from ...utils.binary import read_head_file, read_budget_file
    from ..gwf import npf as npf_mod

    N = gwf_model.nodes
    ssm_spec = ssm_spec or {}

    # group head records into per-step full vectors
    heads = {}
    order = []
    for rec in read_head_file(hds_path):
        key = (rec["kstp"], rec["kper"])
        if key not in heads:
            heads[key] = []
            order.append((key, rec["pertim"], rec["totim"]))
        heads[key].append(rec["data"].reshape(-1))
    hvecs = {k: np.concatenate(v) for k, v in heads.items()}

    # group budget records per step
    buds = {}
    for rec in read_budget_file(cbc_path):
        buds.setdefault((rec["kstp"], rec["kper"]), []).append(rec)

    ia, ja, pos_nm, pos_mn = gwf_model.topo.csr
    out = []
    prev_head = None
    for key, pertim, totim in order:
        head = jnp.asarray(hvecs[key])
        head_old = head if prev_head is None else prev_head
        ibound = jnp.asarray(gwf_model.ibound0, jnp.int32)
        opts, arrays = gwf_model.npf_opts, gwf_model.npf_arrays
        sat = npf_mod.compute_saturation(opts, arrays, head, ibound)
        sat_old = npf_mod.compute_saturation(opts, arrays, head_old, ibound)

        q_edge = jnp.zeros(gwf_model.topo.nedges)
        strg_ss = jnp.zeros(N)
        strg_sy = jnp.zeros(N)
        qs, nodes, masks, concs = [], [], [], []
        delt = 1.0
        for rec in buds.get(key, []):
            delt = rec["delt"]
            if rec["text"] == "FLOW-JA-FACE" and rec["imeth"] == 1:
                q_edge = jnp.asarray(rec["data"][pos_nm])
            elif rec["imeth"] == 6:
                id1, _, q, _ = rec["data"]
                if rec["text"] == "STO-SS":
                    strg_ss = jnp.zeros(N).at[jnp.asarray(id1)].set(
                        jnp.asarray(q))
                elif rec["text"] == "STO-SY":
                    strg_sy = jnp.zeros(N).at[jnp.asarray(id1)].set(
                        jnp.asarray(q))
                else:
                    qs.append(jnp.asarray(q))
                    nodes.append(jnp.asarray(id1, jnp.int32))
                    masks.append(jnp.ones(len(id1), bool))
                    spec = ssm_spec.get(rec["text"], 0.0)
                    concs.append(jnp.broadcast_to(
                        jnp.asarray(spec, jnp.float64), (len(id1),)))
        if qs:
            bq, bn = jnp.concatenate(qs), jnp.concatenate(nodes)
            bm, bc = jnp.concatenate(masks), jnp.concatenate(concs)
        else:
            bq = jnp.zeros(1)
            bn = jnp.zeros(1, jnp.int32)
            bm = jnp.zeros(1, bool)
            bc = jnp.zeros(1)
        out.append((key[0], key[1], delt,
                    FlowFields(q_edge, sat, sat_old, strg_ss, strg_sy,
                               bq, bn, bm, bc)))
        prev_head = head
    return out
