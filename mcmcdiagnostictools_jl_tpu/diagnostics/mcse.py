def mcse(*a, **k):
    raise NotImplementedError
