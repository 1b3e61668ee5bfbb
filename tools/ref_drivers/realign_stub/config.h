#pragma once
/* stub config: no HDF5 — fast5lite's hid_t usages need a typedef */
#include <cstdio>
#include <cstring>
typedef long long hid_t;
typedef unsigned long long hsize_t;
/* HDF5 API stubs: fast5lite's inline functions reference these but the
   golden driver never calls them */
#define H5F_ACC_RDONLY 0
#define H5P_DEFAULT 0
#define H5T_NATIVE_FLOAT 0
#define H5T_NATIVE_INT16 0
#define H5S_ALL 0
typedef long long herr_t;
typedef long long hssize_t;
typedef int H5T_class_t;
#define H5T_STRING 0
#define H5T_VARIABLE ((size_t)-1)
static inline hid_t H5Fopen(const char*, unsigned, hid_t){return -1;}
static inline herr_t H5Fclose(hid_t){return 0;}
static inline hid_t H5Gopen(hid_t, const char*, hid_t){return -1;}
static inline herr_t H5Gclose(hid_t){return 0;}
static inline hid_t H5Dopen(hid_t, const char*, hid_t){return -1;}
static inline herr_t H5Dclose(hid_t){return 0;}
static inline hid_t H5Dget_space(hid_t){return -1;}
static inline herr_t H5Sclose(hid_t){return 0;}
static inline hssize_t H5Sget_simple_extent_npoints(hid_t){return 0;}
static inline herr_t H5Dread(hid_t, hid_t, hid_t, hid_t, hid_t, void*){return -1;}
static inline hid_t H5Aopen(hid_t, const char*, hid_t){return -1;}
static inline herr_t H5Aclose(hid_t){return 0;}
static inline hid_t H5Aget_type(hid_t){return -1;}
static inline herr_t H5Tclose(hid_t){return 0;}
static inline H5T_class_t H5Tget_class(hid_t){return 0;}
static inline herr_t H5Aread(hid_t, hid_t, void*){return -1;}
static inline hid_t H5Tget_native_type(hid_t, int){return -1;}
static inline size_t H5Tget_size(hid_t){return 0;}
static inline int H5Tis_variable_str(hid_t){return 0;}
static inline hid_t H5Tcopy(hid_t){return -1;}
static inline herr_t H5Tset_size(hid_t, size_t){return 0;}
static inline hid_t H5Screate(int){return -1;}
#define H5S_SCALAR 0
#define H5T_C_S1 0
#define H5_INDEX_NAME 0
#define H5_ITER_INC 0
static inline long long H5Lget_name_by_idx(hid_t, const char*, int, int, hsize_t, char*, size_t, hid_t){return 0;}
static inline int H5Sget_simple_extent_dims(hid_t, hsize_t*, hsize_t*){return 0;}
static inline int H5Lexists(hid_t, const char*, hid_t){return 0;}
static inline hid_t H5Oopen(hid_t, const char*, hid_t){return -1;}
static inline herr_t H5Oclose(hid_t){return 0;}
static inline int H5Aexists(hid_t, const char*){return 0;}
static inline hsize_t H5Aget_storage_size(hid_t){return 0;}
