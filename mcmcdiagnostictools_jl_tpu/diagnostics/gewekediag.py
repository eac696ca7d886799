def gewekediag(*a, **k):
    raise NotImplementedError
