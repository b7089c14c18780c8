from gym_fishing_tpu.analysis.simulate import estimate_policyfn, simulate_mdp
from gym_fishing_tpu.analysis.plotting import plot_mdp, plot_policyfn, write_csv
