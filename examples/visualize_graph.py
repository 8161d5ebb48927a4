"""Graph visualization — port of knaster/examples/visualize_graph.rs.

Builds a small patch and prints its Graphviz dot source (renders an SVG when
the `dot` binary is available).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from knaster_tpu.prelude import *  # noqa: F403


def main():
    graph, proc = knaster(outputs=2)  # noqa: F405

    def build(g):
        saw = g.push(PolyBlep(Waveform.Sawtooth, 110.0), name="saw")  # noqa: F405
        filt = g.push(SvfFilter(SvfFilterType.Low, 1800.0, 1.0, 0.0), name="lpf")  # noqa: F405
        env = g.push(EnvAsr(0.01, 0.4), name="env")  # noqa: F405
        pan = g.push(Pan2(0.0), name="pan")  # noqa: F405
        saw.to(filt)
        (filt * env).to(pan)
        pan.to_graph_out()
        fb = g.push(AllpassFeedbackDelay(0.25, feedback=0.4), name="echo")  # noqa: F405
        filt.to(fb)
        fb.out([0]).to_feedback(filt)

    graph.edit(build)
    print(to_dot(graph))  # noqa: F405
    svg = show_dot_svg(graph, "graph.svg")  # noqa: F405
    if svg:
        print(f"rendered {svg}")


if __name__ == "__main__":
    main()
