"""Multi-chip scaling: shard a VoiceBank over a device mesh.

Voice synthesis is embarrassingly parallel over voices (SURVEY §5.8): each
chip renders a contiguous shard of the bank's voices and the mix bus is a
``psum`` over ICI. Events are replicated (tiny) and masked to the local
voice range inside ``shard_map``; all DSP state lives sharded on-device, so
the only per-block collective is the [channels, block] mix-down.

Layout: mesh axis "voices"; each state leaf's voice axis is inferred
structurally (full-bank vs local-shard shapes, wherever it sits in the
leaf); output replicated. This is classic data parallelism riding ICI — no
DCN traffic, no resharding inside the step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ugen import AudioCtx
from .voicebank import VoiceBank


class ShardedVoiceBank:
    """A VoiceBank whose voices are sharded across a mesh axis.

    Usage::

        mesh = jax.make_mesh((n_devices,), ("voices",))
        bank = VoiceBank(FMVoice(), n_voices=8192)
        sb = ShardedVoiceBank(bank, mesh, ctx)
        state = sb.init_state()
        state, out = sb.step(state, sb.empty_events())   # out: [ch, block]
    """

    def __init__(self, bank: VoiceBank, mesh: Mesh, ctx: AudioCtx,
                 axis: str = "voices"):
        if bank.mix != "sum":
            raise ValueError("sharded banks must use mix='sum'")
        self.bank = bank
        self.mesh = mesh
        self.ctx = ctx
        self.axis = axis
        self.n_devices = mesh.shape[axis]
        if bank.n_voices % self.n_devices:
            raise ValueError(
                f"n_voices ({bank.n_voices}) must divide the mesh axis "
                f"({self.n_devices})"
            )
        self.local_voices = bank.n_voices // self.n_devices
        # a local bank instance describing one shard's worth of voices
        self._local = bank.make_local(self.local_voices)
        self._specs = self._infer_state_specs()
        self._step = self._build_step()
        self._render_scan = None

    # ------------------------------------------------------------------
    def _infer_state_specs(self):
        """Derive per-leaf PartitionSpecs structurally: each state leaf's
        voice axis is the (single) axis where the full bank's shape differs
        from a 1/n_devices local bank's (``make_local``) — any bank state
        layout shards correctly without a name list to go stale. Leaves with
        identical shapes are voice-independent and replicate."""
        ctx = self.ctx
        full = jax.eval_shape(lambda: self.bank.init(ctx))
        local = jax.eval_shape(lambda: self._local.init(ctx))
        axis = self.axis

        def spec_for(g, l):
            gs, ls = g.shape, l.shape
            if gs == ls:
                return P()
            diff = [d for d in range(min(len(gs), len(ls))) if gs[d] != ls[d]]
            if len(gs) != len(ls) or len(diff) != 1:
                raise ValueError(
                    f"cannot infer the voice axis of a state leaf: full bank "
                    f"shape {gs} vs local shard shape {ls}"
                )
            return P(*([None] * diff[0] + [axis]))

        return jax.tree_util.tree_map(spec_for, full, local)

    def init_state(self):
        """Build the sharded state: voice axes laid out on the mesh."""
        full_state = self.bank.init(self.ctx)
        specs = self._specs

        def put(x, spec):
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(put, full_state, specs)

    def empty_events(self):
        return self.bank.empty_node_events(dtype=self.ctx.dtype)

    def events_from_lists(self, events):
        return self.bank.node_events_from_lists(events, dtype=self.ctx.dtype)

    # ------------------------------------------------------------------
    def _build_step(self):
        ctx = self.ctx
        local_bank = self._local
        local_bank.track_idle = self.bank.track_idle
        axis = self.axis
        Vl = self.local_voices

        def local_step(state, events):
            # globalize -> localize voice indices; out-of-shard events are
            # masked to the sacrificial pad (voice = -1)
            shard = jax.lax.axis_index(axis)
            lo = shard * Vl
            v = events["voice"]
            local_v = v - lo
            in_shard = (v >= 0) & (local_v >= 0) & (local_v < Vl)
            ev = dict(events)
            ev["voice"] = jnp.where(in_shard, local_v, -1)
            result = local_bank.process(
                ctx, state, jnp.zeros((0, ctx.block_size), ctx.dtype), {}, events=ev
            )
            new_state, out = result[0], result[1]
            # mix bus rides ICI
            out = jax.lax.psum(out, axis)
            return new_state, out

        state_specs = self._specs
        ev_specs = jax.tree_util.tree_map(
            lambda _: P(), self.empty_events()
        )

        shard_fn = jax.shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(state_specs, ev_specs),
            out_specs=(state_specs, P()),
            # pallas_call inside shard_map can't infer varying-mesh-axes
            check_vma=False,
        )
        return jax.jit(shard_fn, donate_argnums=(0,))

    def step(self, state, events):
        """Render one block: returns (state', mixed [channels, block])."""
        return self._step(state, events)

    def render(self, n_blocks: int, events_per_block=None, state=None,
               return_state: bool = False):
        """Bounce n_blocks fully ON DEVICE: one ``lax.scan`` over the
        shard-mapped step (stacked event tensors ride along), one dispatch,
        one result — no per-block Python loop.

        Pass ``state`` (and set ``return_state=True`` to get it back) to
        make consecutive renders sample-continuous, like
        ``AudioProcessor.render``; with no state a fresh one is used."""
        if state is None:
            state = self.init_state()
        if events_per_block is None:
            ev = self.empty_events()
            events_stacked = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (n_blocks,) + x.shape), ev
            )
        else:
            events_stacked = events_per_block

        fn = self._render_scan
        if fn is None:
            step = self._step

            def run(st, evs):
                def body(c, e):
                    c2, out = step(c, e)
                    return c2, out

                st, outs = jax.lax.scan(body, st, evs)
                return st, outs  # outs: [NB, ch, B]

            fn = self._render_scan = jax.jit(run)
        state, outs = fn(state, events_stacked)
        audio = jnp.swapaxes(outs, 0, 1).reshape(self.bank.voice.outputs, -1)
        return (audio, state) if return_state else audio


class MeshVoiceBank(VoiceBank):
    """A mesh-sharded VoiceBank that is a first-class GRAPH NODE.

    Wraps any VoiceBank (vmap or Pallas): its state shards over the mesh's
    voice axis, its block program runs under ``shard_map`` *inside* the
    graph's compiled program, and the mix bus is a ``psum`` over ICI — so a
    sharded 100k-voice bank composes with ordinary nodes (filters, reverb
    busses) in one Graph (SURVEY §5.8 voice-sharding as an engine
    capability). Per-voice control works through the same bank event channel
    (``Handle.voice_param``); events are replicated and masked to each
    shard's voice range on device."""

    def __init__(self, bank: VoiceBank, mesh: Mesh, axis: str = "voices"):
        if bank.mix != "sum":
            raise ValueError("sharded banks must use mix='sum'")
        n_dev = mesh.shape[axis]
        if bank.n_voices % n_dev:
            raise ValueError(
                f"n_voices ({bank.n_voices}) must divide the mesh axis ({n_dev})"
            )
        self.bank = bank
        self.mesh = mesh
        self.axis = axis
        self.inputs = 0
        self.outputs = bank.outputs
        self.mix = "sum"
        self.params = ()
        self.event_capacity = bank.event_capacity
        self.n_voices = bank.n_voices
        self.voice = bank.voice
        self.local_voices = bank.n_voices // n_dev
        self._local = bank.make_local(self.local_voices)
        self._float_names = bank._float_names
        self._trig_names = bank._trig_names
        self._int_names = bank._int_names
        self._specs_cache = None

    def name(self):
        return f"Mesh[{self.bank.name()}]"

    def batch_key(self):
        return None

    # event construction: the global bank's layout (voice ids are global)
    def empty_node_events(self, dtype=np.float32):
        return self.bank.empty_node_events(dtype=dtype)

    def node_events_from_lists(self, events, dtype=np.float32):
        return self.bank.node_events_from_lists(events, dtype=dtype)

    def _specs(self, ctx: AudioCtx):
        if self._specs_cache is None:
            full = jax.eval_shape(lambda: self.bank.init(ctx))
            local = jax.eval_shape(lambda: self._local.init(ctx))
            axis = self.axis

            def spec_for(g, l):
                gs, ls = g.shape, l.shape
                if gs == ls:
                    return P()
                diff = [d for d in range(min(len(gs), len(ls)))
                        if gs[d] != ls[d]]
                if len(gs) != len(ls) or len(diff) != 1:
                    raise ValueError(
                        f"cannot infer the voice axis of a state leaf: "
                        f"full bank shape {gs} vs local shard shape {ls}"
                    )
                return P(*([None] * diff[0] + [axis]))

            self._specs_cache = jax.tree_util.tree_map(spec_for, full, local)
        return self._specs_cache

    def init(self, ctx: AudioCtx):
        specs = self._specs(ctx)
        full = self.bank.init(ctx)

        def put(x, spec):
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(put, full, specs)

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        specs = self._specs(ctx)
        local_bank = self._local
        # VoicePool flips track_idle on THIS node after construction (then
        # forces a recompile); the per-shard bank renders the voices, so the
        # flag must reach it or the idle latch never engages
        local_bank.track_idle = self.track_idle
        axis = self.axis
        Vl = self.local_voices

        def local_step(st, ev):
            shard = jax.lax.axis_index(axis)
            lo = shard * Vl
            if ev is not None:
                v = ev["voice"]
                local_v = v - lo
                in_shard = (v >= 0) & (local_v >= 0) & (local_v < Vl)
                ev = dict(ev)
                ev["voice"] = jnp.where(in_shard, local_v, -1)
            r = local_bank.process(
                ctx, st, jnp.zeros((0, ctx.block_size), ctx.dtype), {},
                events=ev,
            )
            new_state, out = r[0], r[1]
            return new_state, jax.lax.psum(out, axis)

        if events is None:
            fn = jax.shard_map(
                lambda st: local_step(st, None),
                mesh=self.mesh, in_specs=(specs,),
                out_specs=(specs, P()), check_vma=False,
            )
            new_state, out = fn(state)
        else:
            ev_specs = jax.tree_util.tree_map(lambda _: P(), events)
            fn = jax.shard_map(
                local_step,
                mesh=self.mesh, in_specs=(specs, ev_specs),
                out_specs=(specs, P()), check_vma=False,
            )
            new_state, out = fn(state, events)
        return new_state, out
