"""Tests for optimizer extras."""


from cinema_tpu.train.optim import CosineScheduler, warmup_cosine_schedule


def test_cosine_scheduler():
    s = CosineScheduler(base_value=1.0, final_value=0.1, total_iters=20, warmup_iters=5, freeze_iters=2)
    assert s[0] == 0.0 and s[1] == 0.0  # frozen
    assert s[2] == 0.0  # warmup start
    assert abs(s[6] - 1.0) < 0.3
    assert s[100] == 0.1  # past the end
    assert len(s.schedule) == 20


def test_warmup_cosine_endpoints():
    sched = warmup_cosine_schedule(lr=1e-3, min_lr=1e-5, warmup_steps=10, max_n_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert abs(float(sched(100)) - 1e-5) < 1e-9
