# End-to-end Example_01 subset vs the reference's committed golden output.
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

N_DEPTHS = int(sys.argv[1]) if len(sys.argv) > 1 else 11
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "float64"

if DTYPE == "float64":
    jax.config.update("jax_enable_x64", True)
from remo3d_tpu import Model

tools = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
base = "/root/reference/Examples/Example_01"
measurement_depths = np.arange(0, 25.1, 0.1)[:N_DEPTHS]

golden = np.loadtxt(
    base + "/Output/Results_2024_08_17__18_59_29/Results_1.txt", skiprows=2
)

model = Model(tools)
model.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
model.initialize_workers(cpu_workers=1)
t0 = time.time()
model.simulate_logs(measurement_depths, dtype=DTYPE, tol=(1e-9 if DTYPE=="float64" else 3e-7), platform=("cpu" if DTYPE=="float64" else None))
elapsed = time.time() - t0
print(f"\n{N_DEPTHS} depths x 6 tools in {elapsed:.1f}s -> {N_DEPTHS*6/elapsed:.2f} pts/s")

print(f"\n{'depth':>6} " + " ".join(f"{t:>12}" for t in tools))
max_rel = 0.0
for i, d in enumerate(measurement_depths):
    row = []
    gi = np.argmin(np.abs(golden[:, 0] - d))
    for j, t in enumerate(tools):
        ours = model.logs[t][i, 1]
        ref = golden[gi, 1 + j]
        rel = abs(ours - ref) / ref
        max_rel = max(max_rel, rel)
        row.append(f"{ours:7.4f}/{rel*100:4.1f}%")
    print(f"{d:6.1f} " + " ".join(f"{c:>12}" for c in row))
print(f"\nmax rel diff vs golden: {max_rel*100:.2f}%")
