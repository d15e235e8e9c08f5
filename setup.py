from setuptools import setup, find_packages

setup(
    name='assistive_gym_tpu',
    version='0.1.0',
    description='TPU-native assistive-robotics environment engine (JAX/XLA/Pallas)',
    packages=find_packages(),
    package_data={'assistive_gym_tpu': ['models/assets/*.json', 'models/assets/*.npz']},
    python_requires='>=3.10',
    install_requires=['jax', 'flax', 'optax', 'numpy'],
)
