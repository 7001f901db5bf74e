# End-to-end learnability on TPU: synthetic corpus, full-size model
import os, sys, numpy as np
from phones_las_tpu.cli import prepare as prep, train as trn, infer as inf

data, wd = "_runs/synth_data", "_runs/synth_run"
if not os.path.exists(os.path.join(data, "cmvn.json")):
    prep.main(["synthetic", "--out", data, "--n-utts", "256", "--n-phones", "10"])
trn.main(["--preset", "timit_phone_las", "--data", data, "--workdir", wd,
          "--num-steps", "1200", "--batch-size", "32", "--eval-every", "400"])
inf.main(["--workdir", wd, "--data", os.path.join(data, "test.plu"),
          "--output", "_runs/synth_hyp.tsv"])
