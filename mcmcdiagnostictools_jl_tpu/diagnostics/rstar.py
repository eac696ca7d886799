def rstar(*a, **k):
    raise NotImplementedError
